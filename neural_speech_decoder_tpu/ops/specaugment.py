"""SpecAugment (time + feature masking) as a functional, jittable transform.

Reference behavior (``transformer_ctc.py:266-307``): train-only, applied to
the ``[B, T, F]`` latent after the bottleneck; 2 feature masks of width
``U(0, freq_mask_param)`` and 2 time masks of width ``U(0, time_mask_param)``;
the *same* mask is applied across the whole batch (the reference draws one
scalar per mask, not per sample), widths are clipped to the dimension, and a
width of 0 masks nothing.

The reference mutates its input in place — a latent hazard SURVEY.md §5 flags;
the functional JAX form removes that class of bug while keeping identical
masking statistics. Static shapes: masks are built with ``arange`` compares,
no dynamic slicing, so the op jits once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(
    key: jax.Array,
    x: jax.Array,
    *,
    freq_mask_param: int = 100,
    time_mask_param: int = 40,
    num_freq_masks: int = 2,
    num_time_masks: int = 2,
) -> jax.Array:
    """Apply batch-shared time/feature masks to ``[B, T, F]``."""
    _, t, f = x.shape
    keys = jax.random.split(key, num_freq_masks + num_time_masks)

    def mask_axis(k, size, param):
        k1, k2 = jax.random.split(k)
        # Reference: width = int(rand() * param), clipped to size.
        width = jnp.minimum(
            (jax.random.uniform(k1) * param).astype(jnp.int32), size
        )
        start = (jax.random.uniform(k2) * (size - width)).astype(jnp.int32)
        idx = jnp.arange(size)
        return (idx >= start) & (idx < start + width)  # True where masked

    for i in range(num_freq_masks):
        m = mask_axis(keys[i], f, freq_mask_param)
        x = jnp.where(m[None, None, :], 0.0, x)
    for i in range(num_time_masks):
        m = mask_axis(keys[num_freq_masks + i], t, time_mask_param)
        x = jnp.where(m[None, :, None], 0.0, x)
    return x
