"""Run one or more models through the full QRec protocol and print metrics.

Used for the PARITY.md quality tables. Runs ONE process at a time on the
axon TPU (CLAUDE.md); pass --cpu to pin to the host backend for tuning.

    python scripts/run_quality.py BPR LightGCN --seed 1
    python scripts/run_quality.py MHCN --set evaluation.setup="-cv 5 -b 1"
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="+")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument(
        "--set",
        action="append",
        default=[],
        help="conf override key=value (repeatable)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from qrec_tpu import ModelConf, QRec
    from qrec_tpu.ops.metrics import parse_measure

    results = {}
    for name in args.models:
        conf = ModelConf(os.path.join("config", name + ".conf"))
        if args.epochs is not None:
            conf.config["num.max.epoch"] = str(args.epochs)
        for kv in args.set:
            k, v = kv.split("=", 1)
            conf.config[k] = v
        t0 = time.time()
        measure = QRec(conf, seed=args.seed).execute()
        wall = time.time() - t0
        parsed = parse_measure(measure)
        results[name] = {"wall_seconds": round(wall, 1)}
        for block, metrics in parsed.items():
            results[name][block] = {k: round(v, 5) for k, v in metrics.items()}
        print(f"[quality] {name}: {json.dumps(results[name])}", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
