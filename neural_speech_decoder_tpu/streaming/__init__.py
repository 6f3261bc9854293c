from .engine import GRUStreamer

__all__ = ["GRUStreamer"]
