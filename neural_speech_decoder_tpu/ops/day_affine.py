"""Per-day affine input calibration.

The reference learns one ``[D, D]`` weight + ``[1, D]`` bias per recording
day, identity/zero initialized, gathered by trial day index and applied as
``einsum("btd,bdk->btk") + bias`` (GRU: ``model.py:43-47,89-93``; Conformer
``DaySpecificLinear``: ``transformer_ctc.py:26-49``).

TPU design: the gather produces ``[B, D, D]`` matrices (B=64, D=256 → 16 MB
fp32) and the einsum is a batched matmul that maps directly onto the MXU.
Day weights are replicated across the data-parallel mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_day_affine(n_days: int, dim: int, dtype=jnp.float32) -> dict:
    """Identity weights + zero bias per day (model.py:43-47)."""
    w = jnp.tile(jnp.eye(dim, dtype=dtype)[None], (n_days, 1, 1))
    b = jnp.zeros((n_days, dim), dtype=dtype)
    return {"weight": w, "bias": b}


def day_affine(params: dict, x: jax.Array, day_idx: jax.Array) -> jax.Array:
    """Apply the day-specific affine transform.

    Args:
      params: ``{"weight": [nDays, D, D], "bias": [nDays, D]}``.
      x: ``[B, T, D]`` features.
      day_idx: ``[B]`` int day indices.

    Returns: ``[B, T, D]``.
    """
    # mode="clip": out-of-range day indices clamp to the last day instead of
    # jnp.take's default out-of-bounds fill (NaN), which would silently
    # poison every downstream activation.
    w = jnp.take(params["weight"], day_idx, axis=0, mode="clip").astype(x.dtype)
    b = jnp.take(params["bias"], day_idx, axis=0, mode="clip").astype(x.dtype)
    y = jnp.einsum("btd,bdk->btk", x, w, preferred_element_type=jnp.float32)
    return (y + b[:, None, :].astype(jnp.float32)).astype(x.dtype)
