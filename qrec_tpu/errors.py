"""Error taxonomy for qrec_tpu.

The reference (QRec) hard-exits on every error (``exit(-1)`` across
``util/config.py:10,56``, ``QRec.py:42,61``, ``util/io.py:53,67``). We replace
those with a small exception hierarchy so library users can recover and so the
runtime can report clean diagnostics.
"""


class QRecError(Exception):
    """Base class for all qrec_tpu errors."""


class ConfigError(QRecError):
    """Malformed or missing configuration (reference: util/config.py:9-10,54-56)."""


class DataFormatError(QRecError):
    """Malformed rating/relation files (reference: util/io.py:51-53,66-68)."""


class EvaluationError(QRecError):
    """Invalid evaluation protocol settings (reference: base/recommender.py:136-137)."""


class ModelNotFoundError(QRecError):
    """Unknown model name requested from the registry (reference: QRec.py:51-56)."""


class ConvergenceError(QRecError):
    """Training diverged (NaN loss; reference: base/iterativeRecommender.py:84-87)."""
