"""Final evaluation + artifact writing (reference: base/recommender.py
evalRanking :127-179 and evalRatings :96-125).

Produces byte-compatible artifacts: the top-N recommendation list file with
``*`` hit markers, the measure file, the rating-prediction file, and run-log
entries — so results can be diffed against the reference directly.
"""

from __future__ import annotations

import os
from typing import List, Optional

from ..config import ModelConf
from ..errors import EvaluationError
from ..io import write_file
from ..log import Log, timestamp
from ..ops import metrics as M
from ..ops.topk import CatalogRanker


def clamp_rating(pred: float, r_scale) -> float:
    """checkRatingBoundary (base/recommender.py:88-94): clamp to the rating
    scale, else round to 3 decimals."""
    if pred > r_scale[-1]:
        return r_scale[-1]
    if pred < r_scale[0]:
        return r_scale[0]
    return round(pred, 3)


def evaluate(model, data, conf: ModelConf, fold: str = "[1]", log: Optional[Log] = None) -> List[str]:
    ranking = conf.options("item.ranking")
    if ranking.isMainOn():
        return eval_ranking(model, data, conf, fold, log)
    return eval_ratings(model, data, conf, fold, log)


def eval_ranking(model, data, conf, fold="[1]", log=None) -> List[str]:
    ranking = conf.options("item.ranking")
    if not ranking.contains("-topN"):
        raise EvaluationError("No correct evaluation metric is specified!")
    top = ranking.get_ints("-topN")
    n = max(top)
    if n > 100 or n < 1:
        print("N can not be larger than 100! It has been reassigned to 10")
        n = 10
    eval_settings = conf.options("evaluation.setup")
    output = conf.options("output.setup")

    ranker = CatalogRanker(
        data,
        k=n,
        batch_size=getattr(model, "eval_batch_size", 1024),
        mesh=getattr(model, "mesh", None),
    )
    # eval.backend=auto|xla|pallas: the fused masked-scorer kernel (rated-
    # item masking from the packed bitmask in VMEM) exists ONLY as a
    # mesh-sharded path — user blocks shard over all devices
    # (ops/topk.pallas_catalog_topk mesh path). The single-chip dispatch was
    # retired in round 4: honest end-to-end timings (bench.py round 3: 64 ms
    # vs the XLA ranker's 7.5 ms for all lastfm test users) showed the
    # in-kernel bit-expansion masking costs more than the XLA path's
    # mask-fused dot epilogue at catalog scales that fit HBM, so a
    # single-chip `pallas` request falls through to the XLA ranker. Metrics
    # parity between the paths is still asserted (scripts/tpu_verify.py,
    # tests/test_topk.py).
    import jax

    from ..models.base import Recommender as _RecBase

    eval_backend = conf.get("eval.backend", "auto")
    backend_wants_pallas = eval_backend == "pallas"
    use_pallas = (
        backend_wants_pallas
        and getattr(model, "mesh", None) is not None
        and getattr(model, "U", None) is not None
        and getattr(model, "V", None) is not None
        # only plain U·Vᵀ scorers — models with bias/distance scoring
        # override score_fn_params and must take the XLA path
        and type(model).score_fn_params is _RecBase.score_fn_params
        and hasattr(model, "rated_bitmask")
    )
    if backend_wants_pallas and not use_pallas:
        # explicit-choice override notice (matches the dual-kernel VMEM
        # fallback style): the request is honored only under a mesh with a
        # plain-embedding scorer
        print(
            "eval.backend=pallas is mesh-only (single-chip dispatch retired "
            "round 4 — see runtime/evaluator.py); using the XLA ranker"
        )
    if use_pallas:
        from ..ops.topk import pallas_catalog_topk

        ids, scores = pallas_catalog_topk(
            model.U,
            model.V,
            ranker.uids,
            model.rated_bitmask,
            data.global_mean,
            n,
            mesh=model.mesh,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        score_fn, params = model.score_fn_params()
        ids, scores = ranker.topk(score_fn, params)

    rec_list = {}
    rec_output = [
        "userId: recommendations in (itemId, ranking score) pairs, * "
        "means the item matches.\n"
    ]
    for b, user in enumerate(ranker.names):
        items = [
            (data.id2item[int(iid)], float(s))
            for iid, s in zip(ids[b], scores[b])
        ]
        rec_list[user] = items
        line = user + ":" + "".join(
            f" ({name},{score})" + ("*" if name in data.test_set_u[user] else "")
            for name, score in items
        )
        rec_output.append(line + "\n")

    current_time = timestamp()
    if output.isMainOn():
        out_dir = output["-dir"]
        file_name = (
            conf["model.name"] + "@" + current_time + "-top-" + str(n)
            + "items" + fold + ".txt"
        )
        write_file(out_dir, file_name, rec_output)
        print("The result has been output to ", os.path.abspath(out_dir), ".")
    if eval_settings.contains("-predict"):
        # -predict mode writes lists and skips measuring
        # (base/recommender.py:170-172)
        return []
    measure = M.ranking_measure(data.test_set_u, rec_list, top)
    if output.isMainOn():
        out_dir = output["-dir"]
        file_name = (
            conf["model.name"] + "@" + current_time + "-measure" + fold + ".txt"
        )
        write_file(out_dir, file_name, measure)
    if log is not None:
        log.add("###Evaluation Results###")
        log.add(measure)
    print(
        "The result of %s %s:\n%s"
        % (conf["model.name"], fold, "".join(measure))
    )
    return measure


def eval_ratings(model, data, conf, fold="[1]", log=None) -> List[str]:
    output = conf.options("output.setup")
    users = [e[0] for e in data.test_data]
    items = [e[1] for e in data.test_data]
    ratings = [e[2] for e in data.test_data]
    preds = model.predict_ratings(users, items)
    res = ["userId  itemId  original  prediction\n"]
    records = []
    for u, i, r, p in zip(users, items, ratings, preds):
        pred = clamp_rating(float(p), data.r_scale)
        records.append([u, i, r, pred])
        res.append(f"{u} {i} {r} {pred}\n")
    current_time = timestamp()
    if output.isMainOn():
        out_dir = output["-dir"]
        file_name = (
            conf["model.name"] + "@" + current_time
            + "-rating-predictions" + fold + ".txt"
        )
        write_file(out_dir, file_name, res)
        print("The result has been output to ", os.path.abspath(out_dir), ".")
    measure = M.rating_measure(records)
    if output.isMainOn():
        out_dir = output["-dir"]
        file_name = (
            conf["model.name"] + "@" + current_time + "-measure" + fold + ".txt"
        )
        write_file(out_dir, file_name, measure)
    if log is not None:
        log.add("###Evaluation Results###")
        log.add(measure)
    print(
        "The result of %s %s:\n%s"
        % (conf["model.name"], fold, "".join(measure))
    )
    return measure
