from .gru_scan import gru_sequence

__all__ = ["gru_sequence"]
