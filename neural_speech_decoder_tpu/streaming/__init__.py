from .conformer import ConformerStreamer
from .engine import GRUStreamer

__all__ = ["GRUStreamer", "ConformerStreamer"]
