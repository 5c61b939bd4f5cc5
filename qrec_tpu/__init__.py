"""qrec_tpu — a TPU-native recommender-system framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Coder-Yu/QRec:
the model zoo, `.conf` experiment surface, and evaluation protocols — with a
single jitted training loop, on-device negative sampling, device-resident
graph propagation, tiled full-catalog top-k evaluation, and sharding over
TPU meshes.

Canonical 3-line usage (reference: snippet.py:7-9):

    from qrec_tpu import ModelConf, QRec
    rec = QRec(ModelConf('./config/BPR.conf'))
    rec.execute()
"""

from .config import ModelConf, OptionConf
from .errors import QRecError
from .runtime.session import QRec

__version__ = "0.1.0"
__all__ = ["ModelConf", "OptionConf", "QRec", "QRecError", "__version__"]
