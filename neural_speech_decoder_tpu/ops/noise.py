"""Training-time noise augmentation, RNG-keyed and jit-fused.

The reference adds, per train step on GPU (``neural_decoder_trainer.py:
193-201``):
  * white noise: ``X += randn(X.shape) * whiteNoiseSD`` (0.8)
  * constant channel offset: ``X += randn([B, 1, C]) * constantOffsetSD`` (0.2)

(The module-form ``WhiteNoise`` / ``MeanDriftNoise`` in the reference's
``augmentations.py:8-25`` are never wired into training; the inline GPU
version above is the effective behavior — reproduced here as one fused op.)

In JAX these are explicit-key transforms folded into the jitted train step,
so the noise generation runs on-TPU and fuses with the frontend.
"""

from __future__ import annotations

import jax


def apply_noise(
    key: jax.Array,
    x: jax.Array,
    white_noise_sd: float,
    constant_offset_sd: float,
) -> jax.Array:
    """Apply white + constant-offset noise to ``[B, T, C]`` features."""
    if white_noise_sd > 0:
        key, k1 = jax.random.split(key)
        x = x + jax.random.normal(k1, x.shape, x.dtype) * white_noise_sd
    if constant_offset_sd > 0:
        key, k2 = jax.random.split(key)
        b, _, c = x.shape
        x = x + jax.random.normal(k2, (b, 1, c), x.dtype) * constant_offset_sd
    return x


def white_noise(key: jax.Array, x: jax.Array, std: float = 0.1) -> jax.Array:
    """Module-form iid noise transform (reference ``WhiteNoise``,
    augmentations.py:8-15): ``x + N(0, std^2)`` elementwise."""
    return x + jax.random.normal(key, x.shape, x.dtype) * std


def mean_drift_noise(
    key: jax.Array, x: jax.Array, std: float = 0.1
) -> jax.Array:
    """Module-form per-channel offset (reference ``MeanDriftNoise``,
    augmentations.py:17-25): one ``[1, C]`` offset per trial, broadcast over
    time. Accepts ``[T, C]`` or ``[B, T, C]`` (offset per batch row)."""
    c = x.shape[-1]
    shape = (1, c) if x.ndim == 2 else (x.shape[0], 1, c)
    return x + jax.random.normal(key, shape, x.dtype) * std
