"""Gaussian smoothing parity vs the reference torch implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from neural_speech_decoder_tpu.ops.gaussian import (
    conformer_kernel_size,
    gaussian_kernel,
    gaussian_smooth,
    same_padding,
)

from _torch_ref import load_reference


def test_kernel_values_match_reference_gru_path():
    _, ref_aug, _ = load_reference()
    sm = ref_aug.GaussianSmoothing(4, 20, 2.0, dim=1)
    ref_k = sm.weight.numpy()[0, 0]  # all channels share the kernel
    ours = gaussian_kernel(20, 2.0)
    np.testing.assert_allclose(ours, ref_k, rtol=1e-6)


def test_kernel_values_match_reference_conformer_path():
    _, _, ref_tfm = load_reference()
    import torch

    fe = ref_tfm.NeuralFrontend(n_channels=4, gaussian_smooth_width=2.0)
    ref_k = fe.gaussian_kernel.numpy()[0, 0]
    ks = conformer_kernel_size(2.0)
    assert ks == 9 and len(ref_k) == 9
    np.testing.assert_allclose(gaussian_kernel(ks, 2.0), ref_k, rtol=1e-6)


@pytest.mark.parametrize("t", [37, 100])
def test_smoothing_matches_torch_same_padding(t):
    _, ref_aug, _ = load_reference()
    import torch

    c = 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, t, c)).astype(np.float32)

    sm = ref_aug.GaussianSmoothing(c, 20, 2.0, dim=1)
    ref = sm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()

    ours = np.asarray(gaussian_smooth(jnp.asarray(x), 20, 2.0))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conformer_smoothing_matches_torch():
    _, _, ref_tfm = load_reference()
    import torch

    c = 8
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 50, c)).astype(np.float32)
    fe = ref_tfm.NeuralFrontend(n_channels=c, gaussian_smooth_width=2.0)
    with torch.no_grad():
        xt = torch.from_numpy(x).transpose(1, 2)
        k = fe.gaussian_kernel.repeat(c, 1, 1)
        ref = (
            torch.nn.functional.conv1d(
                xt, k, padding=fe.gaussian_padding, groups=c
            )
            .transpose(1, 2)
            .numpy()
        )
    ks = conformer_kernel_size(2.0)
    ours = np.asarray(
        gaussian_smooth(jnp.asarray(x), ks, 2.0, padding=(ks // 2, ks // 2))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_same_padding_even_kernel():
    assert same_padding(20) == (9, 10)
    assert same_padding(9) == (4, 4)
