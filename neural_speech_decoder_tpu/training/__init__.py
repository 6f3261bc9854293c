from .trainer import build_model, load_model, train_model

__all__ = ["build_model", "load_model", "train_model"]
