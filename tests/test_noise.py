"""Noise augmentation transforms (fused and module forms)."""

import numpy as np

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.ops.noise import (
    apply_noise,
    mean_drift_noise,
    white_noise,
)


def test_apply_noise_statistics():
    key = jax.random.key(0)
    x = jnp.zeros((64, 100, 32))
    y = apply_noise(key, x, 0.8, 0.0)
    assert abs(float(y.std()) - 0.8) < 0.02
    # constant offset: identical across time within a trial/channel
    y2 = apply_noise(key, x, 0.0, 0.2)
    assert np.allclose(np.asarray(y2[:, 0, :]), np.asarray(y2[:, 50, :]))
    assert abs(float(y2[:, 0, :].std()) - 0.2) < 0.02


def test_apply_noise_zero_sds_identity():
    x = jax.random.normal(jax.random.key(1), (2, 10, 4))
    y = apply_noise(jax.random.key(2), x, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_white_noise_module_form():
    x = jnp.zeros((50, 16))
    y = white_noise(jax.random.key(0), x, std=0.5)
    assert abs(float(y.std()) - 0.5) < 0.05
    assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))


def test_mean_drift_module_form():
    x = jnp.zeros((50, 16))
    y = mean_drift_noise(jax.random.key(0), x, std=0.3)
    # one offset per channel, constant over time
    assert np.allclose(np.asarray(y[0]), np.asarray(y[-1]))
    xb = jnp.zeros((4, 50, 16))
    yb = mean_drift_noise(jax.random.key(1), xb, std=0.3)
    assert np.allclose(np.asarray(yb[:, 0]), np.asarray(yb[:, -1]))
    assert not np.allclose(np.asarray(yb[0, 0]), np.asarray(yb[1, 0]))
