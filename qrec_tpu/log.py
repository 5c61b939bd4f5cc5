"""Per-run file logger (reference: util/log.py:4-15).

Writes to ``./log/<name>.log`` recording the full configuration then the
final measures, matching the reference's run-log artifact so downstream
tooling can diff runs between frameworks.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Iterable, Union


class Log:
    def __init__(self, module: str, filename: str, directory: str = "./log/"):
        self.logger = logging.getLogger(module + filename)
        self.logger.setLevel(level=logging.INFO)
        self.logger.propagate = False
        if not os.path.exists(directory):
            os.makedirs(directory)
        handler = logging.FileHandler(os.path.join(directory, filename + ".log"))
        handler.setLevel(logging.INFO)
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(levelname)s: %(message)s")
        )
        # avoid duplicate handlers when the same run name repeats in-process
        self.logger.handlers = [handler]

    def add(self, text: Union[str, Iterable[str]]) -> None:
        if not isinstance(text, str):
            text = "".join(text)
        self.logger.info(text)


def timestamp() -> str:
    """Reference-format run timestamp (base/recommender.py:31)."""
    return time.strftime("%Y-%m-%d %H-%M-%S", time.localtime(time.time()))
