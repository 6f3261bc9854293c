from .trainer import build_model, load_model, train_model

# Reference-spelling aliases (neural_decoder_trainer.py:61,390) so code
# migrating from the reference can keep its call sites verbatim.
trainModel = train_model
loadModel = load_model

__all__ = [
    "build_model",
    "load_model",
    "train_model",
    "trainModel",
    "loadModel",
]
