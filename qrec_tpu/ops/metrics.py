"""Ranking / rating metrics.

Two implementations with identical numerics:

* ``ranking_measure`` / ``rating_measure`` — host-side, operating on the same
  dict structures as the reference (util/measure.py) and producing *identical*
  output strings, used for final artifacts and parity checks.
* ``device_ranking_metrics`` — vectorized jnp reductions over padded arrays,
  used for in-training quick evaluation without host round-trips.

The reference's NDCG idiosyncrasies are preserved exactly
(util/measure.py:69-82): binary relevance, natural-log discount ``1/ln(n+2)``,
and IDCG summed over the first ``min(|test_u|, N)`` positions.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..errors import EvaluationError

# ---------------------------------------------------------------------------
# host-side, reference-exact (util/measure.py)
# ---------------------------------------------------------------------------


def hits(origin: Dict[str, dict], predicted: Dict[str, list]) -> Dict[str, int]:
    """Per-user hit counts (util/measure.py:14-21)."""
    hit_count = {}
    for user in origin:
        items = set(origin[user].keys())
        pred = {item[0] for item in predicted[user]}
        hit_count[user] = len(items & pred)
    return hit_count


def precision(hit_count: Dict[str, int], n: int) -> float:
    return sum(hit_count.values()) / (len(hit_count) * n)


def recall(hit_count: Dict[str, int], origin: Dict[str, dict]) -> float:
    recalls = [hit_count[u] / len(origin[u]) for u in hit_count]
    return sum(recalls) / len(recalls)


def f1(prec: float, rec: float) -> float:
    if (prec + rec) != 0:
        return 2 * prec * rec / (prec + rec)
    return 0


def ndcg(origin: Dict[str, dict], predicted: Dict[str, list], n: int) -> float:
    """Reference NDCG (util/measure.py:69-82)."""
    total = 0.0
    for user in predicted:
        dcg = 0.0
        idcg = 0.0
        for pos, item in enumerate(predicted[user]):
            if item[0] in origin[user]:
                dcg += 1.0 / math.log(pos + 2)
        for pos, _ in enumerate(list(origin[user].keys())[:n]):
            idcg += 1.0 / math.log(pos + 2)
        total += dcg / idcg
    return total / len(predicted)


def ranking_measure(
    origin: Dict[str, dict], rec_list: Dict[str, list], top_ns: Sequence[int]
) -> List[str]:
    """Reference-format measure lines (util/measure.py:23-49)."""
    measure: List[str] = []
    for n in top_ns:
        predicted = {user: rec_list[user][:n] for user in rec_list}
        if len(origin) != len(predicted):
            raise EvaluationError(
                "The Lengths of test set and predicted set do not match!"
            )
        hit_count = hits(origin, predicted)
        prec = precision(hit_count, n)
        rec = recall(hit_count, origin)
        measure.append("Top " + str(n) + "\n")
        measure.append("Precision:" + str(prec) + "\n")
        measure.append("Recall:" + str(rec) + "\n")
        measure.append("F1:" + str(f1(prec, rec)) + "\n")
        measure.append("NDCG:" + str(ndcg(origin, predicted, n)) + "\n")
    return measure


def rating_measure(res: Sequence[Sequence]) -> List[str]:
    """MAE/RMSE lines over [user, item, rating, prediction] records
    (util/measure.py:5-12,118-138)."""
    mae_err, rmse_err, count = 0.0, 0.0, 0
    for entry in res:
        mae_err += abs(entry[2] - entry[3])
        rmse_err += (entry[2] - entry[3]) ** 2
        count += 1
    mae = mae_err / count if count else mae_err
    rmse = math.sqrt(rmse_err / count) if count else rmse_err
    return ["MAE:" + str(mae) + "\n", "RMSE:" + str(rmse) + "\n"]


def parse_measure(measure: List[str]) -> Dict[str, Dict[str, float]]:
    """Parse measure lines into {'Top N': {'Precision': ...}} dicts."""
    out: Dict[str, Dict[str, float]] = {}
    current = "global"
    for line in measure:
        line = line.strip()
        if line.startswith("Top "):
            current = line
            out[current] = {}
            continue
        if ":" in line:
            k, v = line.split(":", 1)
            out.setdefault(current, {})[k] = float(v)
    return out


# ---------------------------------------------------------------------------
# device-side vectorized metrics
# ---------------------------------------------------------------------------


def idcg_table(max_n: int) -> np.ndarray:
    """``idcg_table[t] = sum_{n=0}^{t-1} 1/ln(n+2)`` for t in [0, max_n]."""
    terms = 1.0 / np.log(np.arange(max_n) + 2.0)
    return np.concatenate([[0.0], np.cumsum(terms)]).astype(np.float32)


def device_ranking_metrics(
    pred_ids: jnp.ndarray,  # (B, N) int32 — top-N item ids per test user
    test_ids: jnp.ndarray,  # (B, T) int32 — test items, -1 = pad/unseen
    test_counts: jnp.ndarray,  # (B,) int32 — |test items| incl. unseen
    top_ns: Sequence[int],
):
    """Compute Precision/Recall/F1/NDCG@{top_ns} as jnp scalars.

    Matches the reference formulas exactly: precision is the global
    hit-sum over ``B*n`` (util/measure.py:52-54), recall is the per-user
    mean of ``hits/|test|`` (util/measure.py:105-109), NDCG as above.
    """
    n_max = int(pred_ids.shape[1])
    # (B, N): is each predicted item a test item?
    hit_matrix = (pred_ids[:, :, None] == test_ids[:, None, :]) & (
        test_ids[:, None, :] >= 0
    )
    hit_at_pos = jnp.any(hit_matrix, axis=-1)  # (B, N)
    discounts = 1.0 / jnp.log(jnp.arange(n_max) + 2.0)  # natural log
    table = jnp.asarray(idcg_table(n_max))
    results = {}
    b = pred_ids.shape[0]
    for n in top_ns:
        hits_n = jnp.sum(hit_at_pos[:, :n], axis=1)  # (B,)
        prec = jnp.sum(hits_n) / (b * n)
        rec_per_user = hits_n / jnp.maximum(test_counts, 1)
        rec = jnp.mean(rec_per_user)
        f1_val = jnp.where(
            prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0
        )
        dcg = jnp.sum(hit_at_pos[:, :n] * discounts[:n], axis=1)
        idcg = table[jnp.minimum(test_counts, n)]
        ndcg_val = jnp.mean(dcg / jnp.maximum(idcg, 1e-12))
        results[n] = {
            "Precision": prec,
            "Recall": rec,
            "F1": f1_val,
            "NDCG": ndcg_val,
        }
    return results


def device_rating_metrics(
    ratings: jnp.ndarray, predictions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(MAE, RMSE) over aligned rating/prediction vectors."""
    err = predictions - ratings
    mae = jnp.mean(jnp.abs(err))
    rmse = jnp.sqrt(jnp.mean(err**2))
    return mae, rmse
