"""Custom GRU-layer VJP correctness vs plain scan autodiff (float32)."""

import numpy as np

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.gru import _gru_gates, _gru_layer


def _reference_layer(xp, w_hh, b_hh, h0):
    """Same math, no custom_vjp — XLA autodiff is the grad oracle."""
    hdim = h0.shape[-1]

    def step(h, xp_t):
        hp = jnp.einsum(
            "dbh,dhk->dbk", h, w_hh, preferred_element_type=jnp.float32
        ) + b_hh[:, None, :]
        r, z, n, _ = _gru_gates(xp_t, hp, hdim)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, xp)
    return ys


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(0)
    l, d, b, h = 7, 2, 3, 5
    xp = jnp.asarray(rng.standard_normal((l, d, b, 3 * h)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, h, 3 * h)).astype(np.float32) * 0.3)
    bb = jnp.asarray(rng.standard_normal((d, 3 * h)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((d, b, h)).astype(np.float32) * 0.5)
    cot = jnp.asarray(rng.standard_normal((l, d, b, h)).astype(np.float32))

    ys_ref = _reference_layer(xp, w, bb, h0)
    ys_ours = _gru_layer(xp, w, bb, h0)
    np.testing.assert_allclose(
        np.asarray(ys_ours), np.asarray(ys_ref), atol=1e-6
    )

    def loss_ref(xp, w, bb, h0):
        return jnp.sum(_reference_layer(xp, w, bb, h0) * cot)

    def loss_ours(xp, w, bb, h0):
        return jnp.sum(_gru_layer(xp, w, bb, h0) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xp, w, bb, h0)
    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3))(xp, w, bb, h0)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
