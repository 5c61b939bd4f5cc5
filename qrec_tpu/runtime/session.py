"""Session orchestrator — the reference's ``QRec`` class (QRec.py:7-118).

Loads data per the evaluation protocol (``-testSet``/``-ap``/``-cv``/
``-predict``), loads social relations when configured, resolves the model
from the explicit registry (no ``exec``), runs train+eval (sequential folds
for CV — each fold is a fresh jitted program; fold-parallelism over pod
slices belongs to the parallel layer), averages fold measures with the same
string-format averaging as the reference (QRec.py:91-107), and writes the
same artifacts.
"""

from __future__ import annotations

import random as _random
from typing import List, Optional

from .. import io as qio
from ..config import ModelConf, OptionConf
from ..data.dataset import Interactions
from ..data.social import SocialGraph
from ..data.split import cross_validation, data_split
from ..errors import ConfigError, EvaluationError
from ..log import Log, timestamp
from ..models import get_model
from . import evaluator


def run_fold(
    config: ModelConf, train, test, relation, fold: str, seed: int
) -> List[str]:
    """Train + evaluate one fold. Module-level (picklable) so parallel CV
    workers can execute it in a spawned process (reference: the ``run``
    function pickled into each fold process, QRec.py:113-118)."""
    model_cls = get_model(config["model.name"])
    data = Interactions(config, train, test, seed=seed)
    social = None
    if model_cls.requires_social:
        if relation is None:
            raise ConfigError(
                f"model {config['model.name']} requires a 'social' "
                "relation file in the config"
            )
        social = SocialGraph(relation, data)
    model = model_cls(config, data, social=social, fold=fold)
    log = Log(model.model_name, model.model_name + fold + " " + timestamp())
    log.add("### model configuration ###")
    for k in config:
        log.add(k + "=" + config[k])
    if fold == "[1]":
        model.print_config()
    # config-driven model persistence: ``model.setup=-load <path>`` skips
    # training and restores saved factors; ``-save <path>`` writes them after
    # evaluation (reference lifecycle hooks base/recommender.py:186-189 and
    # :208-211 — isLoadModel/isSaveModel, which the reference never wires to
    # config; here the .conf surface drives them)
    msetup = (
        config.options("model.setup") if config.contains("model.setup") else None
    )
    if msetup is not None and msetup.contains("-load"):
        print(f"Loading model {fold}...")
        model.load_model(msetup["-load"])
    else:
        print(f"Building Model {fold}...")
        model.fit()
    timer = getattr(model, "_last_timer", None)
    if timer is not None and timer.times:
        s = timer.summary()
        log.add(
            "### training throughput ###\n"
            f"epochs={int(s['epochs'])} "
            f"epoch_seconds={s['epoch_seconds']:.4f} "
            f"examples_per_second={s['examples_per_second']:.0f}"
        )
    print(f"Predicting {fold}...")
    measure = evaluator.evaluate(model, data, config, fold, log)
    if msetup is not None and msetup.contains("-save"):
        print(f"Saving model {fold}...")
        model.save_model(msetup["-save"])
    return measure, model


def _cv_fold_worker(conf_dict, train, test, relation, fold, seed, order, out_q):
    """Spawned-process CV fold entry: pins the child to the CPU backend
    (parallel folds are CPU-only — a single TPU cannot be shared) and ships
    the measure strings back through the queue."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ..config import ModelConf as _MC

    measure, _ = run_fold(_MC(conf_dict), train, test, relation, fold, seed)
    out_q.put((order, measure))


class QRec:
    def __init__(self, config: ModelConf, seed: int = 0):
        self.config = config
        self.seed = seed
        self.training_data: List[list] = []
        self.test_data: List[list] = []
        self.relation: Optional[List[list]] = None
        self.measure: List[str] = []
        if not config.contains("evaluation.setup"):
            raise ConfigError("Wrong configuration of evaluation!")
        self.evaluation = OptionConf(config["evaluation.setup"])
        binarized = False
        bottom = 0.0
        if self.evaluation.contains("-b"):
            binarized = True
            bottom = float(self.evaluation["-b"])
        self.binarized = binarized

        ratings_path = config["ratings"]
        if self.evaluation.contains("-testSet"):
            self.training_data = qio.load_ratings(
                config, ratings_path, binarized=binarized, threshold=bottom
            )
            self.test_data = qio.load_ratings(
                config,
                self.evaluation["-testSet"],
                binarized=binarized,
                threshold=bottom,
            )
        elif self.evaluation.contains("-ap"):
            all_data = qio.load_ratings(
                config, ratings_path, binarized=binarized, threshold=bottom
            )
            self.training_data, self.test_data = data_split(
                all_data,
                test_ratio=float(self.evaluation["-ap"]),
                binarized=binarized,
                rng=_random.Random(seed),
            )
        elif self.evaluation.contains("-cv"):
            self.training_data = qio.load_ratings(
                config, ratings_path, binarized=binarized, threshold=bottom
            )
        elif self.evaluation.contains("-predict"):
            self.training_data = qio.load_ratings(
                config, ratings_path, binarized=binarized, threshold=bottom
            )
            self.test_data = qio.load_user_list(self.evaluation["-predict"])
        else:
            raise EvaluationError(
                "evaluation.setup must contain one of -testSet/-ap/-cv/-predict"
            )

        if config.contains("social"):
            self.relation = qio.load_relations(config, config["social"])
        print("Reading data and preprocessing...")

    # ------------------------------------------------------------------
    def _run_fold(self, train, test, fold: str) -> List[str]:
        measure, model = run_fold(
            self.config, train, test, self.relation, fold, self.seed
        )
        self.model = model
        return measure

    def _run_folds_parallel(self, folds) -> List[List[str]]:
        """Concurrent fold execution (``evaluation.setup ... -p``,
        QRec.py:82-89): one spawned OS process per fold, CPU backend.
        Results come back order-keyed through a queue, like the reference's
        Manager().dict() keyed by fold index (QRec.py:64-65,118)."""
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        out_q = ctx.Queue()
        procs = []
        for i, (train, test) in enumerate(folds):
            p = ctx.Process(
                target=_cv_fold_worker,
                args=(
                    dict(self.config.config),
                    train,
                    test,
                    self.relation,
                    f"[{i + 1}]",
                    self.seed,
                    i,
                    out_q,
                ),
            )
            p.start()
            procs.append(p)
        results = {}
        for _ in procs:
            order, measure = out_q.get()
            results[order] = measure
        for p in procs:
            p.join()
        return [results[i] for i in range(len(folds))]

    def execute(self) -> List[str]:
        if self.evaluation.contains("-cv"):
            k = int(self.evaluation["-cv"])
            if k < 2 or k > 10:
                raise EvaluationError(
                    "k for cross-validation should be between 2 and 10"
                )
            folds = list(
                cross_validation(self.training_data, k, binarized=self.binarized)
            )
            parallel = self.evaluation.contains("-p")
            if parallel:
                import jax

                if jax.default_backend() != "cpu":
                    print(
                        "-p parallel folds need one device per process; a "
                        "single TPU cannot be shared — running folds "
                        "sequentially"
                    )
                    parallel = False
            if parallel:
                fold_measures = self._run_folds_parallel(folds)
            else:
                fold_measures = [
                    self._run_fold(train, test, f"[{i + 1}]")
                    for i, (train, test) in enumerate(folds)
                ]
            # string-format averaging (QRec.py:91-107)
            res = []
            for i in range(len(fold_measures[0])):
                if fold_measures[0][i][:3] == "Top":
                    res.append(fold_measures[0][i])
                    continue
                metric = fold_measures[0][i].split(":")[0]
                total = sum(
                    float(fold_measures[j][i].split(":")[1]) for j in range(k)
                )
                res.append(metric + ":" + str(total / k) + "\n")
            # the reference writes the CV summary UNCONDITIONALLY, ignoring
            # the output.setup main switch (QRec.py:103-106) — match it
            output = OptionConf(self.config["output.setup"])
            out_dir = output.get("-dir", "./results/")
            file_name = (
                self.config["model.name"] + "@" + timestamp()
                + "-" + str(k) + "-fold-cv.txt"
            )
            qio.write_file(out_dir, file_name, res)
            print(
                "The result of %d-fold cross validation:\n%s" % (k, "".join(res))
            )
            self.measure = res
            return res
        self.measure = self._run_fold(self.training_data, self.test_data, "[1]")
        return self.measure
