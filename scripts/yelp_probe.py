"""Probe which graph backends work (and how fast) at yelp2018 scale on the
tunneled TPU — feeds the bench.py yelp_scale_* section.

yelp2018 shape per reference README.md:477-486: 19,539 users × 21,266
items, 450,884 interactions. The real blobs are stripped from this mount
(.MISSING_LARGE_BLOBS), so the dataset is synthesized zipf-shaped at the
same statistics.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_yelp_data(extra=None):
    from bench import build_yelp_scale

    conf, data = build_yelp_scale(extra)
    print(
        f"[yelp] realized shape: {data.num_users} x {data.num_items}, "
        f"{len(data.training_data)} train / {len(data.test_data)} test"
    )
    return conf, data


def probe(backend_conf, label):
    import jax

    from bench import time_epochs_chunked
    from qrec_tpu.models import get_model

    t_build = time.time()
    try:
        conf, data = build_yelp_data(extra=backend_conf)
        model = get_model("LightGCN")(conf, data)
        spec = model.build()
        dt = time_epochs_chunked(model, spec, chunk=4, reps=2)
        n = len(data.training_data)
        print(
            f"[yelp] {label}: epoch {dt * 1e3:.1f} ms "
            f"({n / dt:,.0f} ex/s) [total {time.time() - t_build:.0f}s]",
            flush=True,
        )
        # eval
        from qrec_tpu.ops.topk import CatalogRanker, embedding_score_fn

        params = spec.params
        sp = (
            spec.score_params_fn(params, *(() if spec.consts is None else (spec.consts,)))
            if spec.score_params_fn is not None
            else params
        )
        ranker = CatalogRanker(data, k=20, batch_size=1024)
        ids, _ = ranker.topk_device(embedding_score_fn, sp)
        jax.block_until_ready(ids)
        t0 = time.perf_counter()
        for _ in range(3):
            ids, _ = ranker.topk_device(embedding_score_fn, sp)
        jax.block_until_ready(ids)
        ev = (time.perf_counter() - t0) / 3
        print(
            f"[yelp] {label}: eval {ev * 1e3:.1f} ms for {len(ranker.names)} "
            f"users x {data.num_items} items",
            flush=True,
        )
    except Exception as e:
        print(f"[yelp] {label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "pallas": ({"graph.backend": "pallas"}, "pallas PaddedCOO"),
        "coo": ({"graph.backend": "coo"}, "XLA COO"),
        "int8": (
            {"graph.backend": "dense", "graph.dense.quant": "int8"},
            "dense int8",
        ),
        "dense": ({"graph.backend": "dense"}, "dense bf16"),
    }
    for k, (c, label) in cases.items():
        if which in ("all", k):
            probe(c, label)
