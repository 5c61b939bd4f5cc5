"""Roofline d-sweep (VERDICT round-3 #8): LightGCN/lastfm epoch +
propagation utilization at d ∈ {50, 64, 128}, bf16 and int8 adjacency.

Adjacency bytes are d-independent while propagation FLOPs scale with d, so
an HBM-bound epoch should hold near-flat wall time as d (and MXU lane
utilization) grows. Records epoch ms, examples/s, propagation TFLOP/s and
adjacency GB/s for PARITY.md.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, time_epochs_chunked  # noqa: E402

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def run(d, quant):
    from qrec_tpu.models import get_model

    over = {"num.factors": str(d)}
    if quant:
        over["graph.dense.quant"] = "int8"
    conf, data = build_problem(over)
    model = get_model("LightGCN")(conf, data)
    spec = model.build()
    dt = time_epochs_chunked(model, spec, chunk=8, reps=3)
    n = len(data.training_data)
    u_n, i_n = data.num_users, data.num_items
    steps = (n + model.batch_size - 1) // model.batch_size
    n_layers = model.n_layers
    flops_epoch = steps * 2 * n_layers * 2 * (2 * u_n * i_n * d)
    tflops = flops_epoch / dt / 1e12
    elem_bytes = 1 if quant else 2
    adj_bytes = steps * 2 * n_layers * (2 * u_n * i_n * elem_bytes)
    gbps = adj_bytes / dt / 1e9
    print(
        f"d={d:4d} quant={'int8' if quant else 'bf16'}: "
        f"epoch {dt * 1e3:6.2f} ms  {n / dt / 1e6:5.2f}M ex/s  "
        f"{tflops:5.1f} TFLOP/s ({100 * tflops / V5E_BF16_PEAK_TFLOPS:4.1f}% peak)  "
        f"adj {gbps:4.0f} GB/s ({100 * gbps / V5E_HBM_GBPS:3.0f}% HBM)",
        flush=True,
    )


if __name__ == "__main__":
    for d in (50, 64, 128):
        for quant in (False, True):
            run(d, quant)
