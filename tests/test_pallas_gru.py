"""Pallas GRU sequence kernel vs the lax.scan reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.gru import _gru_layer
from neural_speech_decoder_tpu.ops.pallas.gru_scan import gru_sequence


def _case(seed=0, l=6, d=2, b=16, h=128, dtype=np.float32):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((l, d, b, 3 * h)).astype(dtype))
    w = jnp.asarray(rng.standard_normal((d, h, 3 * h)).astype(dtype) * 0.2)
    bb = jnp.asarray(rng.standard_normal((d, 3 * h)).astype(dtype) * 0.1)
    return xp, w, bb


def _flip_d1(x):
    """The kernel consumes/produces direction 1 in natural time order; the
    lax.scan oracle expects/returns it pre-flipped."""
    if x.shape[1] == 2:
        return x.at[:, 1].set(jnp.flip(x[:, 1], axis=0))
    return x


@pytest.mark.parametrize("d", [1, 2])
def test_forward_matches_scan(d):
    xp, w, bb = _case(d=d)
    h0 = jnp.zeros((d, xp.shape[2], w.shape[1]), xp.dtype)
    ref = _flip_d1(_gru_layer(_flip_d1(xp), w, bb, h0))
    ours = gru_sequence(xp, w, bb, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_gradients_match_scan():
    xp, w, bb = _case(l=5, b=16, h=128)
    h0 = jnp.zeros((2, 16, 128), xp.dtype)
    cot = jnp.asarray(
        np.random.default_rng(1).standard_normal((5, 2, 16, 128)).astype(np.float32)
    )

    def loss_ref(xp, w, bb):
        return jnp.sum(_flip_d1(_gru_layer(_flip_d1(xp), w, bb, h0)) * cot)

    def loss_pal(xp, w, bb):
        return jnp.sum(gru_sequence(xp, w, bb, True) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, w, bb)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(xp, w, bb)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
