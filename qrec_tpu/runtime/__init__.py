from .session import QRec

__all__ = ["QRec"]
