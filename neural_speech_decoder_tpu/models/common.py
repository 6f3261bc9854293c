"""Parameter-initialization helpers matching the reference's distributions.

Exact RNG streams cannot (and need not) match across frameworks; what matters
for training parity is the distribution *family* and scale:
  * orthogonal recurrent weights / xavier-uniform input weights for the GRU
    (reference ``model.py:59-63``),
  * torch's default GRU bias init ``U(-1/sqrt(H), 1/sqrt(H))``,
  * torch ``nn.Linear`` default: kaiming-uniform(a=√5) weights — which for a
    linear layer reduces to ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` — and
    uniform biases with the same bound.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, dtype=jnp.float32, *, fan_in=None, fan_out=None):
    """Xavier/Glorot uniform for a [in, out]-shaped matrix."""
    fi = fan_in if fan_in is not None else shape[0]
    fo = fan_out if fan_out is not None else shape[-1]
    bound = math.sqrt(6.0 / (fi + fo))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal init for 2-D matrices (rows orthonormal if square)."""
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def torch_linear_init(key, in_dim, out_dim, dtype=jnp.float32, *, bias=True):
    """torch nn.Linear default init; returns (weight [in,out], bias [out])."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    if not bias:
        return w, None
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return w, b


def uniform_bound(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)
