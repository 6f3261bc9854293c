"""Fused single-pass Adam(+L2) update — a MEASURED-NO-GAIN experiment.

Hypothesis: the optax chain for the reference GRU recipe
(``add_decayed_weights -> scale_by_adam -> scale_by_learning_rate``,
``optim.py``) measures 9.1 ms/step at reference scale (133.8M params) —
413 GB/s effective vs the v5e's nominal ~819 GB/s HBM — so a single-pass
kernel reading (g, p, m, v) and writing (p, m, v) exactly once should
roughly halve it.

Measured outcome (1x v5e, BASELINE.md): the hypothesis is FALSE on both
fronts. (a) A hand-fused single-expression jnp update (``adam_leaf_ref``
tree-wide) runs at 9.13 ms — identical to the optax chain, i.e. XLA
already fuses the chain into one pass and ~410 GB/s is the practical
elementwise read+write ceiling, not a fusion deficit. (b) The per-leaf
Pallas version is *slower* (17.6 ms; ~25 kernel launches of pipeline
spin-up dominate), dropping the full train step 516 -> 474 seq/s.

The module stays as the recorded experiment with its oracle tests;
``fused_optimizer: true`` opts in (default OFF — the optax chain is
already at the floor). Update math (torch Adam semantics):

  g'  = g + l2 * p                      (torch Adam L2 semantics)
  m'  = b1 m + (1-b1) g'
  v'  = b2 v + (1-b2) g'^2
  p' -= lr * (m'/(1-b1^t)) / (sqrt(v'/(1-b2^t)) + eps)   (eps OUTSIDE sqrt,
                                         optax eps_root=0 / torch parity)

p/m/v alias in place (donated); bias corrections and the LR stream in as
one (1, 4) scalar block; non-128-multiple leaves use the jnp twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_MAX_ROWS = 1024  # rows per grid block (1024 x 128 f32 x 7 arrays ~ 3.7 MB)


def _adam_math(g, p, m, v, lr, c1, c2, *, b1, b2, eps, l2):
    """Shared elementwise update in f32. Returns (p', m', v')."""
    g = g + l2 * p
    m_n = b1 * m + (1.0 - b1) * g
    v_n = b2 * v + (1.0 - b2) * g * g
    upd = (m_n * c1) / (jnp.sqrt(v_n * c2) + eps)
    return p - lr * upd, m_n, v_n


def adam_leaf_ref(g, p, m, v, scalars, *, b1, b2, eps, l2):
    """Pure-jnp twin (oracle + fallback for non-tileable leaves)."""
    lr, c1, c2 = scalars[0, 0], scalars[0, 1], scalars[0, 2]
    p_n, m_n, v_n = _adam_math(
        g.astype(jnp.float32), p.astype(jnp.float32),
        m.astype(jnp.float32), v.astype(jnp.float32),
        lr, c1, c2, b1=b1, b2=b2, eps=eps, l2=l2,
    )
    return p_n.astype(p.dtype), m_n.astype(m.dtype), v_n.astype(v.dtype)


def _kernel(g_ref, p_ref, m_ref, v_ref, s_ref, po_ref, mo_ref, vo_ref,
            *, b1, b2, eps, l2):
    lr = s_ref[0, 0]
    c1 = s_ref[0, 1]
    c2 = s_ref[0, 2]
    p_n, m_n, v_n = _adam_math(
        g_ref[...].astype(jnp.float32), p_ref[...].astype(jnp.float32),
        m_ref[...].astype(jnp.float32), v_ref[...].astype(jnp.float32),
        lr, c1, c2, b1=b1, b2=b2, eps=eps, l2=l2,
    )
    po_ref[...] = p_n.astype(po_ref.dtype)
    mo_ref[...] = m_n.astype(mo_ref.dtype)
    vo_ref[...] = v_n.astype(vo_ref.dtype)


def _block_rows(rows: int) -> int | None:
    for br in (_MAX_ROWS, 512, 256, 128, 64, 32, 16, 8):
        if rows % br == 0:
            return br
    return rows if rows <= _MAX_ROWS else None


def adam_leaf(g, p, m, v, scalars, *, b1, b2, eps, l2, interpret=False):
    """One leaf's fused update; falls back to jnp for non-tileable sizes."""
    n = p.size
    rows = n // LANES
    br = _block_rows(rows) if n % LANES == 0 and rows > 0 else None
    if br is None:
        return adam_leaf_ref(g, p, m, v, scalars, b1=b1, b2=b2, eps=eps,
                             l2=l2)
    shape = p.shape
    g2, p2, m2, v2 = (a.reshape(rows, LANES) for a in (g, p, m, v))
    tile = pl.BlockSpec((br, LANES), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps, l2=l2),
        grid=(rows // br,),
        in_specs=[
            tile, tile, tile, tile,
            pl.BlockSpec((1, 4), lambda i: (0, 0)),
        ],
        out_specs=[tile, tile, tile],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), p.dtype),
            jax.ShapeDtypeStruct((rows, LANES), m.dtype),
            jax.ShapeDtypeStruct((rows, LANES), v.dtype),
        ],
        # p, m, v update in place (inputs 1,2,3 -> outputs 0,1,2)
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(g2, p2, m2, v2, scalars)
    return tuple(a.reshape(shape) for a in out)


def fused_adam_update(
    grads, params, mu, nu, count, lr, *,
    b1: float = 0.9, b2: float = 0.999, eps: float = 0.1, l2: float = 0.0,
    use_pallas: bool | None = None, interpret: bool = False,
):
    """Tree-wide fused update.

    Args:
      count: step count BEFORE this update (optax convention — bias
        corrections use ``count + 1``).
      lr: scalar learning rate for this step (schedule already applied).

    Returns ``(new_params, new_mu, new_nu)``.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    t = (count + 1).astype(jnp.float32)
    c1 = 1.0 / (1.0 - jnp.float32(b1) ** t)
    c2 = 1.0 / (1.0 - jnp.float32(b2) ** t)
    scalars = jnp.stack(
        [jnp.float32(lr), c1, c2, jnp.float32(0.0)]
    ).reshape(1, 4)

    leaf = (
        functools.partial(adam_leaf, interpret=interpret)
        if use_pallas
        else adam_leaf_ref
    )
    flat_g, treedef = jax.tree.flatten(grads)
    flat_p = treedef.flatten_up_to(params)
    flat_m = treedef.flatten_up_to(mu)
    flat_v = treedef.flatten_up_to(nu)
    new_p, new_m, new_v = [], [], []
    for g, p, m, v in zip(flat_g, flat_p, flat_m, flat_v):
        pn, mn, vn = leaf(g, p, m, v, scalars, b1=b1, b2=b2, eps=eps, l2=l2)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)
    return (
        jax.tree.unflatten(treedef, new_p),
        jax.tree.unflatten(treedef, new_m),
        jax.tree.unflatten(treedef, new_v),
    )
