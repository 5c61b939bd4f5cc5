"""LightGCN/lastfm epoch: bf16 DenseJoint vs int8-quantized adjacency
(graph.dense.quant=int8), chunked dispatch — the real training step."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_problem, time_epochs_chunked  # noqa: E402


def run(quant):
    from qrec_tpu.models import get_model

    over = {"graph.dense.quant": "int8"} if quant else None
    conf, data = build_problem(over)
    model = get_model("LightGCN")(conf, data)
    spec = model.build()
    dt = time_epochs_chunked(model, spec, chunk=8, reps=3)
    n = len(data.training_data)
    print(
        f"quant={'int8' if quant else 'off '}: epoch {dt * 1e3:.2f} ms "
        f"({n / dt:,.0f} examples/s)"
    )
    return dt


if __name__ == "__main__":
    t_bf = run(False)
    t_q = run(True)
    print(f"speedup {t_bf / t_q:.2f}x")
