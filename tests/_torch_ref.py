"""Import the reference PyTorch implementation as a *test oracle*.

The reference at /root/reference is used read-only to validate numerical
parity of the JAX implementation; no code is copied from it. Tests that need
it skip cleanly when it is unavailable.
"""

import sys

import pytest

REF_SRC = "/root/reference/src"


def load_reference():
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    try:
        import neural_decoder.model as ref_model
        import neural_decoder.augmentations as ref_aug
        import neural_decoder.transformer_ctc as ref_tfm
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference oracle unavailable: {e}")
    return ref_model, ref_aug, ref_tfm


def torch_gru_decoder(**kwargs):
    ref_model, _, _ = load_reference()
    import torch

    torch.manual_seed(0)
    return ref_model.GRUDecoder(device="cpu", **kwargs)
