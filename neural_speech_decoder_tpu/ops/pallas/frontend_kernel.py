"""Fused Pallas frontend: Gaussian smoothing + day affine + Softsign.

One kernel pass per trial replaces three XLA ops (depthwise smooth conv,
gathered batched matmul, pointwise Softsign) on the GRU path
(``model.py:84-93``): the activation tensor makes a single HBM round trip
instead of three, and the per-trial day calibration matrix is selected by a
*scalar-prefetched* day index (``PrefetchScalarGridSpec``) so the gather
never materializes the ``[B, C, C]`` weight copy the XLA path needs.

Grid: one program per batch row; the whole ``[T, C]`` trial (1.3 MB at
reference scale) plus its ``[C, C]`` day matrix live in VMEM. Smoothing is
computed as a static sum of shifted slices over a zero-padded copy —
identical to torch-"same" conv semantics (left pad (k-1)//2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import gaussian_kernel, same_padding


def _make_kernel(taps: np.ndarray, pad_left: int, pad_right: int):
    n_taps = len(taps)

    def kernel(day_ref, x_ref, w_ref, b_ref, out_ref):
        del day_ref  # consumed by the index maps
        x = x_ref[0].astype(jnp.float32)  # [T, C]
        t = x.shape[0]
        padded = jnp.pad(x, ((pad_left, pad_right), (0, 0)))
        sm = jnp.zeros_like(x)
        for j in range(n_taps):  # static starts: lowers as lax.slice
            sm = sm + float(taps[j]) * padded[j : j + t]
        y = (
            jnp.dot(
                sm.astype(x_ref.dtype),
                w_ref[0].astype(x_ref.dtype),
                preferred_element_type=jnp.float32,
            )
            + b_ref[0, 0].astype(jnp.float32)
        )
        out_ref[0] = jax.nn.soft_sign(y).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "sigma", "interpret")
)
def fused_frontend(
    x: jax.Array,
    day_weights: jax.Array,
    day_bias: jax.Array,
    day_idx: jax.Array,
    *,
    kernel_size: int,
    sigma: float,
    interpret: bool = False,
) -> jax.Array:
    """softsign(day_affine(gaussian_smooth(x))) in one kernel.

    Args:
      x: ``[B, T, C]``; day_weights ``[nDays, C, C]``; day_bias ``[nDays, C]``;
      day_idx ``[B]`` int32.

    Returns ``[B, T, C]`` in x.dtype. Matches the unfused op chain
    (gaussian_smooth → day_affine → soft_sign) to float tolerance.
    """
    b, t, c = x.shape
    # The XLA twin (day_affine) clips out-of-range day indices (load-
    # bearing for -1 sentinels / unseen eval days); an unclipped index
    # here would select an out-of-bounds weight block via the
    # scalar-prefetch index map.
    day_idx = jnp.clip(
        day_idx.astype(jnp.int32), 0, day_weights.shape[0] - 1
    )
    taps = gaussian_kernel(kernel_size, sigma)
    pad_l, pad_r = same_padding(kernel_size)
    kern = _make_kernel(taps, pad_l, pad_r)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, day: (i, 0, 0)),
            pl.BlockSpec((1, c, c), lambda i, day: (day[i], 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, day: (day[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, day: (i, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        day_idx.astype(jnp.int32),
        x,
        day_weights,
        day_bias[:, None, :],
    )
