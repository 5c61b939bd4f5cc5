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
        model_cls = get_model(self.config["model.name"])
        data = Interactions(self.config, train, test, seed=self.seed)
        social = None
        if model_cls.requires_social:
            if self.relation is None:
                raise ConfigError(
                    f"model {self.config['model.name']} requires a 'social' "
                    "relation file in the config"
                )
            social = SocialGraph(self.relation, data)
        model = model_cls(self.config, data, social=social, fold=fold)
        log = Log(
            model.model_name, model.model_name + fold + " " + timestamp()
        )
        log.add("### model configuration ###")
        for k in self.config:
            log.add(k + "=" + self.config[k])
        if fold == "[1]":
            model.print_config()
        print(f"Building Model {fold}...")
        model.fit()
        print(f"Predicting {fold}...")
        measure = evaluator.evaluate(model, data, self.config, fold, log)
        self.model = model
        return measure

    def execute(self) -> List[str]:
        if self.evaluation.contains("-cv"):
            k = int(self.evaluation["-cv"])
            if k < 2 or k > 10:
                raise EvaluationError(
                    "k for cross-validation should be between 2 and 10"
                )
            fold_measures = []
            for i, (train, test) in enumerate(
                cross_validation(self.training_data, k, binarized=self.binarized)
            ):
                fold_measures.append(self._run_fold(train, test, f"[{i + 1}]"))
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
            output = OptionConf(self.config["output.setup"])
            if output.isMainOn():
                out_dir = output["-dir"]
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
