#!/bin/bash
# Round-3 quality-parity sweep (VERDICT items 4+5): run every previously
# unmeasured model through its shipped config/protocol, then the reference
# 5-fold-CV protocol for the flagship SSL models. One TPU process at a time
# (CLAUDE.md); per-model timeout so one hang can't eat the round.
#
#   nohup bash scripts/quality_sweep.sh > /tmp/quality_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/quality_sweep_results.jsonl
: > "$OUT"

run() {  # run <timeout_s> <model> [extra args...]
  local t=$1; shift
  local name=$1
  echo "=== $(date +%H:%M:%S) START $* ===" >&2
  timeout "$t" python scripts/run_quality.py "$@" --seed 1 2>&1 \
    | tee /tmp/quality_last.log | grep '^\[quality\]' >> "$OUT" \
    || echo "{\"model\": \"$name\", \"error\": \"rc=$? (timeout or crash)\"}" >> "$OUT"
}

# -- rating family, FilmTrust (fast) ----------------------------------------
for m in UserMean ItemMean UserKNN ItemKNN SlopeOne BasicMF PMF \
         SoRec SoReg SocialMF LOCABAL SocialFD SREE CUNE_MF; do
  run 1800 "$m" "$m"
done

# -- ranking family, lastfm ---------------------------------------------------
for m in Rand MostPopular WRMF ExpoMF CoFactor SERec SBPR TBPR DHCF \
         APR NeuMF DMF CDAE CFGAN IRGAN CUNE_BPR IF_BPR ESRF RSGAN; do
  run 2400 "$m" "$m"
done

# -- reference 5-fold-CV protocol for the flagship SSL models ----------------
for m in SimGCL SGL SEPT; do
  run 6000 "${m}-cv5" "$m" --set 'evaluation.setup=-cv 5 -b 1'
done

echo "=== SWEEP DONE $(date) ===" >&2
