#!/bin/bash
# Round-3 quality-parity sweep (VERDICT items 4+5): run every previously
# unmeasured model through its shipped config/protocol, then the reference
# 5-fold-CV protocol for the flagship SSL models. One TPU process at a time
# (CLAUDE.md); per-model timeout so one hang can't eat the round.
#
#   nohup bash scripts/quality_sweep.sh [phase2|phase3] > /tmp/quality_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/quality_sweep_results.jsonl

run() {  # run <timeout_s> <label> <model> [extra args...]
  local t=$1 label=$2
  shift 2
  echo "=== $(date +%H:%M:%S) START $label ===" >&2
  timeout "$t" python scripts/run_quality.py "$@" --seed 1 2>&1 \
    | tee /tmp/quality_last_$label.log | grep '^\[quality\]' >> "$OUT" \
    || echo "{\"model\": \"$label\", \"error\": \"rc=$? (timeout or crash)\"}" >> "$OUT"
}

phase=${1:-phase2}

if [ "$phase" = phase2 ]; then
  # remaining ranking family, lastfm
  for m in SBPR TBPR DHCF APR NeuMF DMF CDAE CFGAN IRGAN CUNE_BPR IF_BPR ESRF RSGAN; do
    run 2400 "$m" "$m"
  done
  # rating models whose shipped LR diverged — re-run with the tuned confs
  for m in PMF SoRec SoReg SocialMF SREE CUNE_MF; do
    run 1200 "$m" "$m"
  done
fi

# reference 5-fold-CV protocol for the flagship SSL models
for m in SimGCL SGL SEPT; do
  run 6000 "${m}cv5" "$m" --set 'evaluation.setup=-cv 5 -b 1'
done

echo "=== SWEEP DONE $(date) ===" >&2
