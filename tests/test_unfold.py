"""Unfold / fused unfold-matmul parity vs torch nn.Unfold."""

import numpy as np

import jax.numpy as jnp

from neural_speech_decoder_tpu.ops.unfold import (
    ctc_input_lengths,
    unfold,
    unfold_matmul,
    unfold_output_length,
)


def test_unfold_matches_torch_layout():
    import torch

    b, t, c, k, s = 2, 45, 6, 8, 3
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, t, c)).astype(np.float32)

    unfolder = torch.nn.Unfold((k, 1), dilation=1, padding=0, stride=s)
    # Reference pipeline: [B,T,C] -> permute(0,2,1) -> unsqueeze(3) -> unfold
    # -> permute(0,2,1)  (model.py:96-101)
    xt = torch.from_numpy(x)
    ref = unfolder(xt.permute(0, 2, 1).unsqueeze(3)).permute(0, 2, 1).numpy()

    ours = np.asarray(unfold(jnp.asarray(x), k, s))
    assert ours.shape == ref.shape == (b, unfold_output_length(t, k, s), c * k)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_unfold_matmul_equals_materialized():
    b, t, c, k, s, o = 2, 61, 5, 9, 4, 7
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((c * k, o)).astype(np.float32))
    ref = unfold(x, k, s) @ w
    ours = unfold_matmul(x, w, k, s)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_ctc_input_lengths_reference_formula():
    # Reference reports (len-k)//s (neural_decoder_trainer.py:209), one less
    # than the unfold's actual frame count when (len-k) % s == 0.
    lens = jnp.array([32, 33, 36, 100, 1200])
    out = ctc_input_lengths(lens, 32, 4)
    np.testing.assert_array_equal(np.asarray(out), [0, 0, 1, 17, 292])
    assert unfold_output_length(36, 32, 4) == 2  # vs reported 1
