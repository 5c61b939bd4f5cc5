"""Model registry.

Replaces the reference's ``exec``-based dynamic import (QRec.py:51-56) with an
explicit name→class map. Models register lazily so importing the package stays
cheap; ``get_model`` resolves a name to its class.
"""

from __future__ import annotations

import importlib
from typing import Dict, Tuple

from ..errors import ModelNotFoundError

# name -> (module, attribute)
_REGISTRY: Dict[str, Tuple[str, str]] = {
    # baselines
    "UserMean": ("qrec_tpu.models.baselines", "UserMean"),
    "ItemMean": ("qrec_tpu.models.baselines", "ItemMean"),
    "MostPopular": ("qrec_tpu.models.baselines", "MostPopular"),
    "Rand": ("qrec_tpu.models.baselines", "Rand"),
    # shallow MF
    "BasicMF": ("qrec_tpu.models.mf", "BasicMF"),
    "PMF": ("qrec_tpu.models.mf", "PMF"),
    "SVD": ("qrec_tpu.models.mf", "SVD"),
    "BPR": ("qrec_tpu.models.mf", "BPR"),
    # graph CF
    "LightGCN": ("qrec_tpu.models.graph", "LightGCN"),
    "NGCF": ("qrec_tpu.models.graph", "NGCF"),
    "SGL": ("qrec_tpu.models.graph", "SGL"),
    "SimGCL": ("qrec_tpu.models.graph", "SimGCL"),
    # deep CF
    "NeuMF": ("qrec_tpu.models.deep", "NeuMF"),
    "DMF": ("qrec_tpu.models.deep", "DMF"),
    "CDAE": ("qrec_tpu.models.deep", "CDAE"),
    "CFGAN": ("qrec_tpu.models.deep", "CFGAN"),
    "APR": ("qrec_tpu.models.deep", "APR"),
    "IRGAN": ("qrec_tpu.models.gan", "IRGAN"),
    # social MF (rating)
    "SoRec": ("qrec_tpu.models.social_mf", "SoRec"),
    "SoReg": ("qrec_tpu.models.social_mf", "SoReg"),
    "SocialMF": ("qrec_tpu.models.social_mf", "SocialMF"),
    "RSTE": ("qrec_tpu.models.social_mf", "RSTE"),
    "LOCABAL": ("qrec_tpu.models.social_mf", "LOCABAL"),
    "SREE": ("qrec_tpu.models.social_mf", "SREE"),
    "SocialFD": ("qrec_tpu.models.social_mf", "SocialFD"),
    # social ranking
    "SBPR": ("qrec_tpu.models.social_ranking", "SBPR"),
    "TBPR": ("qrec_tpu.models.social_ranking", "TBPR"),
    # social + hypergraph SSL
    "MHCN": ("qrec_tpu.models.social_graph", "MHCN"),
    "SEPT": ("qrec_tpu.models.social_graph", "SEPT"),
    "BUIR": ("qrec_tpu.models.social_graph", "BUIR"),
    "DiffNet": ("qrec_tpu.models.social_graph", "DiffNet"),
    "DHCF": ("qrec_tpu.models.social_graph", "DHCF"),
    # classical
    "UserKNN": ("qrec_tpu.models.classical", "UserKNN"),
    "ItemKNN": ("qrec_tpu.models.classical", "ItemKNN"),
    "SlopeOne": ("qrec_tpu.models.classical", "SlopeOne"),
    "SVDPlusPlus": ("qrec_tpu.models.classical", "SVDPlusPlus"),
    # reference display name (main.py:41-49 menu-maps "SVD++" to config/SVD++.conf)
    "SVD++": ("qrec_tpu.models.classical", "SVDPlusPlus"),
    "EE": ("qrec_tpu.models.classical", "EE"),
    # walk-based network embedding
    "CUNE_MF": ("qrec_tpu.models.walk", "CUNE_MF"),
    "CUNE_BPR": ("qrec_tpu.models.walk", "CUNE_BPR"),
    "IF_BPR": ("qrec_tpu.models.ifbpr", "IF_BPR"),
    # adversarial social refinement
    "ESRF": ("qrec_tpu.models.adversarial_social", "ESRF"),
    "RSGAN": ("qrec_tpu.models.adversarial_social", "RSGAN"),
    # ALS family
    "WRMF": ("qrec_tpu.models.als", "WRMF"),
    "ExpoMF": ("qrec_tpu.models.als", "ExpoMF"),
    "CoFactor": ("qrec_tpu.models.als", "CoFactor"),
    "SERec": ("qrec_tpu.models.als", "SERec"),
}

# display name -> canonical registry/conf-key name (the reference's conf files
# key model arguments under the *class* name, e.g. SVD++.conf carries
# ``SVDPlusPlus=-y 0.01``)
ALIASES: Dict[str, str] = {
    "SVD++": "SVDPlusPlus",
}


def register(name: str, module: str, attr: str) -> None:
    _REGISTRY[name] = (module, attr)


def get_model(name: str):
    if name not in _REGISTRY:
        raise ModelNotFoundError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    module, attr = _REGISTRY[name]
    return getattr(importlib.import_module(module), attr)


def available_models():
    return sorted(_REGISTRY)
