"""Grid-tune EE (Euclidean embedding) on FilmTrust, CPU backend.

Round-1 PARITY measured RMSE 1.013 with the untuned shipped conf; the
literature ballpark for tuned MF-family models on FilmTrust is RMSE
0.80-0.90 (PARITY.md). This sweeps lr / reg / factors / epochs to close
that gap; the winning setting gets written into config/EE.conf and
re-verified on TPU via scripts/tpu_verify.py --quality.
"""

import itertools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from qrec_tpu import ModelConf, QRec


def run(lr, reg, factors, epochs):
    conf = ModelConf(
        {
            "ratings": "/root/reference/dataset/FilmTrust/ratings.txt",
            "ratings.setup": "-columns 0 1 2",
            "model.name": "EE",
            "evaluation.setup": "-ap 0.2",
            "item.ranking": "off -topN 10",
            "num.factors": str(factors),
            "num.max.epoch": str(epochs),
            "batch_size": "2000",
            "learnRate": f"-init {lr} -max 1",
            "reg.lambda": f"-u {reg} -i {reg} -b {reg} -s 0.02",
            "output.setup": "off -dir ./results/",
        }
    )
    measure = QRec(conf, seed=1).execute()
    text = "".join(measure)
    mae = float(re.search(r"MAE:([0-9.]+)", text).group(1))
    rmse = float(re.search(r"RMSE:([0-9.]+)", text).group(1))
    return mae, rmse


def main():
    grid = list(
        itertools.product(
            [0.005, 0.01, 0.02, 0.05],  # lr
            [0.001, 0.01, 0.05, 0.1],  # reg
            [10, 20],  # factors
            [100],  # epochs
        )
    )
    results = []
    for lr, reg, f, ep in grid:
        try:
            mae, rmse = run(lr, reg, f, ep)
        except Exception as e:  # divergence → skip
            print(f"lr={lr} reg={reg} f={f} ep={ep}: FAILED {e}", flush=True)
            continue
        results.append((rmse, mae, lr, reg, f, ep))
        print(
            f"lr={lr} reg={reg} f={f} ep={ep}: MAE={mae:.4f} RMSE={rmse:.4f}",
            flush=True,
        )
    results.sort()
    print("\n=== best 5 by RMSE ===")
    for rmse, mae, lr, reg, f, ep in results[:5]:
        print(f"RMSE={rmse:.4f} MAE={mae:.4f}  lr={lr} reg={reg} f={f} ep={ep}")


if __name__ == "__main__":
    main()
