from .dataset import Interactions
from .social import SocialGraph
from .split import data_split, cross_validation

__all__ = ["Interactions", "SocialGraph", "data_split", "cross_validation"]
