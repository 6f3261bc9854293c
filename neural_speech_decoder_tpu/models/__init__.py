from .gru import GRUConfig, gru_forward, gru_encode, gru_output_length, init_gru_params

__all__ = [
    "GRUConfig",
    "gru_forward",
    "gru_encode",
    "gru_output_length",
    "init_gru_params",
]
