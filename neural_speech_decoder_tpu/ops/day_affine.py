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
    n_days = params["weight"].shape[0]
    # One-hot selection instead of gather: the forward costs one tiny
    # [B, nDays] @ [nDays, D*D] matmul, and — decisively — the backward
    # becomes a matmul too (dW = onehot^T @ per-trial grads) instead of a
    # scatter-add of [B, D, D] into [nDays, D, D], which XLA lowers ~6x
    # slower on TPU. Clipping replicates jnp.take(mode="clip") (an
    # out-of-bounds fill would silently NaN every downstream activation).
    idx = jnp.clip(day_idx, 0, n_days - 1)
    onehot = jax.nn.one_hot(idx, n_days, dtype=x.dtype)
    w = jnp.einsum(
        "bn,ndk->bdk", onehot, params["weight"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    b = jnp.einsum(
        "bn,nd->bd", onehot, params["bias"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = jnp.einsum("btd,bdk->btk", x, w, preferred_element_type=jnp.float32)
    return (y + b[:, None, :].astype(jnp.float32)).astype(x.dtype)
