"""Counter-based hash RNG for dropout masks (XLA level and inside Pallas).

``jax.random.bernoulli`` lowers to a standalone rng-bit-generator kernel
plus an extra HBM round trip for the bits; at reference Conformer scale the
per-step dropout draws cost ~18 ms (B=64, profiled). This stateless
murmur3-style finalizer is ~10 int32 VPU ops per element that XLA fuses
straight into the consuming elementwise op (the where/multiply), so masks
never touch HBM. The same function runs unchanged inside Pallas kernels
(int32 throughout: Mosaic lacks uint32→float32 casts).

Statistical quality is ample for dropout (murmur3 finalizer passes the
relevant uniformity tests); it is NOT a cryptographic or reproducibility-
across-versions RNG. Used by ``models/conformer.py::_dropout`` and
``ops/pallas/attention_kernel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _const(x: int):
    """uint32 constant as its int32 bit pattern."""
    return jnp.int32(int(np.uint32(x).view(np.int32)))


def _shr(x, n: int):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def uniform2d(seed, salt, shape) -> jax.Array:
    """f32 uniforms in [0, 1) for a 2-D shape from (seed, salt, row, col).

    ``seed``/``salt`` are int32 scalars (tracers fine). Two's-complement
    wrapping multiplies; logical shifts treat bits as unsigned.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    h = (
        r * _const(0x9E3779B1)
        ^ c * _const(0x85EBCA77)
        ^ seed * _const(0xC2B2AE3D)
        ^ salt * _const(0x27D4EB2F)
    )
    h = h ^ _shr(h, 15)
    h = h * _const(0x2C1B3C6D)
    h = h ^ _shr(h, 12)
    h = h * _const(0x297A2D39)
    h = h ^ _shr(h, 15)
    # top 23 bits → [0, 1); int32 is non-negative after the logical >> 9
    return _shr(h, 9).astype(jnp.float32) * (1.0 / (1 << 23))


def keep_mask2d(seed, salt, shape, rate: float) -> jax.Array:
    """Bernoulli(1-rate) keep mask over a 2-D shape."""
    return uniform2d(seed, salt, shape) >= rate


def key_to_seed(key) -> jax.Array:
    """Fold a JAX PRNG key (threefry or rbg) into an int32 scalar seed.

    The fold must be position-sensitive, not a plain XOR: rbg key_data is
    the 2-word threefry data REPEATED (``[a, b, a, b]``), so a symmetric
    XOR cancels to 0 for every rbg key — which would freeze the dropout
    seed at 0 for the trainer's default ``rng_impl='rbg'`` keys (same
    mask every step). A multiply between words breaks the cancellation.
    """
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    folded = jnp.uint32(0x9E3779B9)
    for i in range(kd.size):
        folded = (folded ^ kd[i]) * jnp.uint32(0x85EBCA6B)
        folded = folded ^ jax.lax.shift_right_logical(folded, jnp.uint32(13))
    # uint32 → int32 bit reinterpretation (XLA-level; fine outside Mosaic)
    return jax.lax.bitcast_convert_type(folded, jnp.int32)


def hash_dropout(key, x, rate: float, train: bool) -> jax.Array:
    """Drop-in replacement for bernoulli dropout on [..., N] tensors.

    Same distribution, different bits: masks fuse into the consumer instead
    of materializing rng output in HBM.
    """
    if not train or rate <= 0 or key is None:
        return x
    n = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    keep = keep_mask2d(key_to_seed(key), jnp.int32(0), (m, n), rate)
    keep = keep.reshape(x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))
