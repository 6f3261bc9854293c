"""Fused Pallas frontend vs the unfused op chain (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.ops.day_affine import day_affine
from neural_speech_decoder_tpu.ops.gaussian import gaussian_smooth
from neural_speech_decoder_tpu.ops.pallas.frontend_kernel import fused_frontend


def test_fused_frontend_matches_op_chain():
    rng = np.random.default_rng(0)
    b, t, c, n_days = 3, 40, 128, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray(
        np.stack([np.eye(c) + 0.1 * rng.standard_normal((c, c))
                  for _ in range(n_days)]).astype(np.float32)
    )
    bias = jnp.asarray(0.1 * rng.standard_normal((n_days, c)).astype(np.float32))
    day_idx = jnp.asarray([0, 2, 3], dtype=jnp.int32)

    ref = jax.nn.soft_sign(
        day_affine({"weight": w, "bias": bias},
                   gaussian_smooth(x, 20, 2.0), day_idx)
    )
    ours = fused_frontend(
        x, w, bias, day_idx, kernel_size=20, sigma=2.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_fused_frontend_day_selection():
    # distinct day matrices must actually be selected per row
    rng = np.random.default_rng(1)
    b, t, c = 2, 16, 128
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.stack([jnp.eye(c) * 0.5, jnp.eye(c) * 2.0])
    bias = jnp.zeros((2, c))
    out = fused_frontend(
        x, w, bias, jnp.asarray([1, 0], jnp.int32),
        kernel_size=20, sigma=2.0, interpret=True,
    )
    sm = gaussian_smooth(x, 20, 2.0)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(jax.nn.soft_sign(sm[0] * 2.0)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(jax.nn.soft_sign(sm[1] * 0.5)),
        atol=1e-5,
    )
