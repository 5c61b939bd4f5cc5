from . import losses, metrics, sampling, spmm, topk

__all__ = ["losses", "metrics", "sampling", "spmm", "topk"]
