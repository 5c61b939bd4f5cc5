#!/bin/bash
# Round-3 TPU validation sequence (runs after the quality sweep frees the
# chip): dual-kernel timing/numerics, tile sweep, full bench, DHCF quality
# re-run (COO aux path), and the /verify recipe legs.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/tpu_round3.log
: > "$LOG"

step() { echo "=== $(date +%H:%M:%S) $1 ===" >> "$LOG"; }

step "dual_bench (transposed kernel numerics + per-application timing)"
timeout 900 python scripts/dual_bench.py >> "$LOG" 2>&1

step "dual_tile_sweep"
timeout 1200 python scripts/dual_tile_sweep.py >> "$LOG" 2>&1

step "bench.py (full JSON: LightGCN + SimGCL + pallas eval)"
timeout 1500 python bench.py >> "$LOG" 2>&1

step "DHCF quality re-run (aux dense cap -> COO)"
timeout 2400 python scripts/run_quality.py DHCF --seed 1 >> "$LOG" 2>&1

step "verify leg A: 5-epoch LightGCN graph.backend=pallas"
sed -e 's/num.max.epoch=.*/num.max.epoch=5/' \
    -e 's#-dir ./results/#-dir /tmp/verify_results/#' \
    config/LightGCN.conf > /tmp/verify_lgn.conf
echo 'graph.backend=pallas' >> /tmp/verify_lgn.conf
echo 'graph.dense.limit=1' >> /tmp/verify_lgn.conf
timeout 900 python main.py /tmp/verify_lgn.conf >> "$LOG" 2>&1

step "verify leg B: same conf, default dense backend (parity probe)"
sed -e 's/num.max.epoch=.*/num.max.epoch=5/' \
    -e 's#-dir ./results/#-dir /tmp/verify_results/#' \
    config/LightGCN.conf > /tmp/verify_lgn_dense.conf
timeout 900 python main.py /tmp/verify_lgn_dense.conf >> "$LOG" 2>&1

step "DONE"
