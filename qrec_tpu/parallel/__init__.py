from .mesh import make_mesh, shardings
from .topk import sharded_full_topk

__all__ = ["make_mesh", "shardings", "sharded_full_topk"]
