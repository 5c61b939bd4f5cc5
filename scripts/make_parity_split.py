"""Generate the FIXED lastfm 80/20 split shared by the reference-run parity
oracle and qrec_tpu (both sides load it via `evaluation.setup=-testSet ...`).

Reference protocol anchor: QRec.py:27-31 (-ap random partition) — replaced
here by a seeded, reproducible split so the two frameworks see identical
train/test data and measure files can be diffed line-by-line.

Writes dataset files to --out (default /tmp/parity_data).
"""
import argparse
import os
import random

REF_LASTFM = "/root/reference/dataset/lastfm/ratings.txt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/parity_data")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--ratio", type=float, default=0.2)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    with open(REF_LASTFM) as f:
        lines = f.readlines()
    rng = random.Random(args.seed)
    idx = list(range(len(lines)))
    rng.shuffle(idx)
    n_test = int(len(lines) * args.ratio)
    test_idx = set(idx[:n_test])
    train = [lines[i] for i in range(len(lines)) if i not in test_idx]
    test = [lines[i] for i in sorted(test_idx)]
    with open(os.path.join(args.out, "lastfm_train.txt"), "w") as f:
        f.writelines(train)
    with open(os.path.join(args.out, "lastfm_test.txt"), "w") as f:
        f.writelines(test)
    print(f"lastfm: {len(train)} train / {len(test)} test -> {args.out}")


if __name__ == "__main__":
    main()
