"""Walk/SGNS infrastructure + CUNE model tests."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops import walks as W
from qrec_tpu.ops.metrics import parse_measure


def test_random_walks_respect_edges():
    # path graph 0-1-2-3
    adj = sp.csr_matrix(
        np.array(
            [
                [0, 1, 0, 0],
                [1, 0, 1, 0],
                [0, 1, 0, 1],
                [0, 0, 1, 0],
            ],
            dtype=np.float32,
        )
    )
    walks, active = W.random_walks(adj, 4, 6, np.random.RandomState(0))
    assert list(active) == [0, 1, 2, 3]
    assert walks.shape == (16, 6)
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            assert adj[a, b] > 0


def test_random_walks_weighted_bias():
    # node 0 connects to 1 (weight 9) and 2 (weight 1)
    adj = sp.csr_matrix(
        np.array([[0, 9, 1], [9, 0, 0], [1, 0, 0]], dtype=np.float32)
    )
    walks, _ = W.random_walks(adj, 2000, 2, np.random.RandomState(1))
    from_zero = walks[walks[:, 0] == 0]
    frac = (from_zero[:, 1] == 1).mean()
    assert 0.82 < frac < 0.97


def test_skipgram_embeds_communities():
    # two cliques joined weakly: embeddings should cluster by clique
    n = 12
    a = np.zeros((n, n), dtype=np.float32)
    for i in range(6):
        for j in range(6):
            if i != j:
                a[i, j] = 1
                a[i + 6, j + 6] = 1
    adj = sp.csr_matrix(a)
    walks, active = W.random_walks(adj, 30, 8, np.random.RandomState(0))
    centers, contexts = W.walk_pairs(walks, 3)
    emb = W.train_skipgram(centers, contexts, n, 8, active, epochs=15, seed=0)
    ids, sims = W.topk_cosine_neighbors(emb, jnp.asarray(active), 5)
    ids = np.asarray(ids)
    same_clique = 0
    for node in range(n):
        same_clique += sum(
            1 for f in ids[node] if (f < 6) == (node < 6)
        )
    assert same_clique / (n * 5) > 0.8


def _write_block_dataset(tmp_path, explicit=False):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            r = rng.randint(3, 6) if explicit else 1
            lines.append(f"u{u} i{i} {r}\n")
    p = tmp_path / "ratings.txt"
    p.write_text("".join(lines))
    return str(p)


def test_cune_bpr_learns_blocks(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    conf = ModelConf(
        {
            "ratings": ratings,
            "ratings.setup": "-columns 0 1 2",
            "model.name": "CUNE_BPR",
            "evaluation.setup": "-ap 0.2",
            "item.ranking": "on -topN 10",
            "num.factors": "16",
            "num.max.epoch": "30",
            "batch_size": "64",
            "learnRate": "-init 0.05 -max 1",
            "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
            "CUNE-BPR": "-T 10 -L 10 -l 16 -w 5 -k 10 -s 2 -ep 10",
            "output.setup": "off -dir ./results/",
            "seed": "7",
        }
    )
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > 0.5, parsed


def test_cune_mf_rating(tmp_path):
    ratings = _write_block_dataset(tmp_path, explicit=True)
    conf = ModelConf(
        {
            "ratings": ratings,
            "ratings.setup": "-columns 0 1 2",
            "model.name": "CUNE_MF",
            "evaluation.setup": "-ap 0.2",
            "item.ranking": "off -topN 10",
            "num.factors": "8",
            "num.max.epoch": "25",
            "batch_size": "64",
            "learnRate": "-init 0.02 -max 1",
            "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
            "CUNE-MF": "-T 10 -L 5 -l 10 -w 5 -k 5 -a 0.1 -ep 10",
            "output.setup": "off -dir ./results/",
            "seed": "7",
        }
    )
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)["global"]
    assert parsed["RMSE"] < 1.7, parsed
