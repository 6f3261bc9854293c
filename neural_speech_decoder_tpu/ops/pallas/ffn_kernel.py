"""Fused Conformer feed-forward (half-step FF) Pallas kernel.

The Conformer's dominant cost is its FF stack: 16 half-step FF modules
per step (2 per block, ``models/conformer.py::_ff_module``, reference
``transformer_ctc.py:194-263``), each LN → Linear(D→F) → SiLU → dropout
→ Linear(F→D) → dropout. Measured at reference scale (B=64, T'=313,
D=1024, F=2048): 4.91 ms fwd+bwd per module as XLA ops vs 3.67 ms for
the bare matmul pair vs ~2.5 ms roofline — i.e. ~1.2 ms/module of LN /
bias / dropout glue and [T,F] HBM round-trips, ~20 ms/step across the
stack.

**Status: measured-NO-GAIN experiment, opt-in** (``ConformerConfig.
fused_ffn``, default False). Isolated, the kernel beats the XLA twin
(3.97 vs 4.91 ms fwd+bwd at reference scale); in the full train step it
regresses (158 → 168 ms/step B=64) because XLA fuses the FF glue into
neighboring ops in-graph and the custom-call boundary blocks those
fusions — there is no quadratic HBM intermediate here for the kernel to
eliminate, unlike the MHSA kernel. Full numbers: BASELINE.md
"Fused-FFN experiment".

The kernel runs the whole module per batch row in VMEM:

  * grid ``(B,)``; per program the [T, D] x-block, the [T, F]
    intermediate, and both weight matrices live in VMEM. The weight
    BlockSpecs are constant over the grid, so Mosaic fetches them once
    and keeps them resident across programs — HBM traffic is x in, out
    out, nothing else;
  * LN statistics in f32 (matching ``models/conformer.py::_layer_norm``),
    matmuls in the input dtype with f32 accumulation + f32 bias adds
    (matching ``_linear``), SiLU on the cast activation dtype;
  * dropout at both sites via the TPU hardware PRNG re-seeded per
    (seed, site, program) — the backward kernel regenerates identical
    masks, nothing is stored. Interpret mode (CPU tests) uses the
    counter-hash generator instead (backend-portable bits; the
    interpreter stubs the hardware PRNG to zeros) — same mechanism as
    ``attention_kernel._keep_mask``;
  * custom VJP: one backward kernel recomputes the forward (flash-style)
    and produces dx plus all parameter gradients; dW1/dW2 accumulate
    directly into their grid-resident output buffers (constant index
    maps — flushed to HBM once), vector gradients (db1, db2, dLN-scale,
    dLN-bias) exit as [B, 1, ·] per-program partials summed by XLA
    outside.

The pure-JAX twin (``ffn_reference``) is the correctness oracle and the
multi-device / non-bf16 fallback path; it matches
``models/conformer.py::_ff_module`` with dropout disabled exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_kernel import _keep_mask

LN_EPS = 1e-5  # models/conformer.py::_layer_norm


def ffn_reference(x, scale, bias, w1, b1, w2, b2):
    """Pure-JAX oracle: the FF module without dropout, matching
    ``models/conformer.py::_ff_module`` (LN → lin1 → SiLU → lin2) op
    for op: f32 LN statistics, activation-dtype matmuls with f32
    accumulation, f32 bias adds."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias).astype(
        x.dtype
    )
    h = jnp.einsum("...d,df->...f", xn, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = (h + b1.astype(jnp.float32)).astype(x.dtype)
    h = jax.nn.silu(h)
    o = jnp.einsum("...f,fd->...d", h, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (o + b2.astype(jnp.float32)).astype(x.dtype)


def _norm(xf, scale, bias):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (xf - mean) * rstd
    return xhat * scale + bias, xhat, rstd


def _site_masks(shapes, rate, seed_ref, pid, hw):
    """Per-site keep masks: site index folded into the program id so the
    two sites draw independent streams (and the backward regenerates the
    same bits)."""
    n = pl.num_programs(0)
    return [
        _keep_mask(shp, rate, seed_ref[0], pid + site * n, hw)
        for site, shp in enumerate(shapes)
    ]


def _fwd_kernel(seed_ref, x_ref, scale_ref, bias_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, o_ref, *, rate: float, hw: bool):
    pid = pl.program_id(0)
    cdt = x_ref.dtype
    xf = x_ref[0].astype(jnp.float32)
    xn, _, _ = _norm(xf, scale_ref[0], bias_ref[0])
    s = jax.lax.dot_general(
        xn.astype(cdt), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    # explicit f32 sigmoid: Mosaic mis-lowers jax.nn.silu on bf16 vectors
    # (f32→bf16 vector.broadcast verification failure); numerics match the
    # twin's silu-of-cast-value up to bf16 rounding, exactly for f32.
    sb = s.astype(cdt).astype(jnp.float32)
    h = (sb * jax.nn.sigmoid(sb)).astype(cdt)
    if rate > 0.0:
        m1, m2 = _site_masks(
            [h.shape, (h.shape[0], o_ref.shape[-1])], rate, seed_ref, pid,
            hw,
        )
        inv = 1.0 / (1.0 - rate)
        h = jnp.where(m1, h * inv, 0.0).astype(cdt)
    o = jax.lax.dot_general(
        h, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if rate > 0.0:
        o = jnp.where(m2, o * inv, 0.0)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, scale_ref, bias_ref, w1_ref, b1_ref,
                w2_ref, g_ref, dx_ref, dscale_ref, dbias_ref, db1_ref,
                db2_ref, dw1_ref, dw2_ref, *, rate: float, hw: bool):
    pid = pl.program_id(0)
    f32 = jnp.float32
    cdt = x_ref.dtype
    d = x_ref.shape[-1]

    # ---- forward recompute ----
    xf = x_ref[0].astype(f32)
    scale = scale_ref[0]
    _, xhat, rstd = _norm(xf, scale, bias_ref[0])
    xn = (xhat * scale + bias_ref[0]).astype(cdt)
    s = jax.lax.dot_general(
        xn, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[0]
    sc = s.astype(cdt).astype(f32)  # silu sees the cast value
    sig = jax.nn.sigmoid(sc)
    h = sc * sig
    # forward's exact rounding sequence for the w2 operand: silu rounded
    # to cdt, then `hq * inv` multiplied IN cdt (a python-float scalar
    # stays weak-typed, so the forward's bf16 multiply uses the
    # bf16-rounded constant — an f32 multiply here would round ~13% of
    # bf16 elements differently) and rounded again. `hq` must be
    # bit-identical to what the forward multiplied by w2; the silu
    # backward below reads sc/sig, not hq.
    hq = h.astype(cdt)
    if rate > 0.0:
        m1, m2 = _site_masks(
            [h.shape, (h.shape[0], d)], rate, seed_ref, pid, hw
        )
        inv = 1.0 / (1.0 - rate)
        hq = jnp.where(m1, hq * inv, 0.0).astype(cdt)

    g = g_ref[0].astype(f32)
    if rate > 0.0:
        g = jnp.where(m2, g * inv, 0.0)  # through the output dropout
    db2_ref[0, 0] = jnp.sum(g, axis=0)
    # dW accumulators: the dw1/dw2 outputs have constant index maps, so
    # their VMEM buffers persist across the sequential grid — accumulate
    # into them directly (flushed to HBM once, at the end of the grid).
    dw2_part = jax.lax.dot_general(
        hq, g.astype(cdt), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    @pl.when(pid == 0)
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)

    dw2_ref[:] += dw2_part
    # dh = g @ W2ᵀ
    dh = jax.lax.dot_general(
        g.astype(cdt), w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    if rate > 0.0:
        dh = jnp.where(m1, dh * inv, 0.0)
    # SiLU' = sig · (1 + s·(1 − sig))
    ds = dh * sig * (1.0 + sc * (1.0 - sig))
    db1_ref[0, 0] = jnp.sum(ds, axis=0)
    dsb = ds.astype(cdt)
    dw1_ref[:] += jax.lax.dot_general(
        xn, dsb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    # dxn = ds @ W1ᵀ ; then LN backward
    dxn = jax.lax.dot_general(
        dsb, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    dscale_ref[0, 0] = jnp.sum(dxn * xhat, axis=0)
    dbias_ref[0, 0] = jnp.sum(dxn, axis=0)
    dxhat = dxn * scale
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_x = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_x)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _const2d(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _row(shape):
    # [B, 1, ·] per-program partial outputs: the row block must be 3-D so
    # the last two dims satisfy Mosaic's (8, 128)-or-equal tiling rule
    # (block (1, 1, n) over array (B, 1, n)).
    return pl.BlockSpec((1, 1, shape), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _ffn(x, scale, bias, w1, b1, w2, b2, seed, rate, interpret):
    out, _ = _ffn_fwd(x, scale, bias, w1, b1, w2, b2, seed, rate, interpret)
    return out


def _vmem_params(t: int, f: int, bwd: bool):
    # generous scoped-VMEM ceiling: the weight blocks + [T,F] f32
    # intermediates (+ the two dW accumulators in backward) exceed
    # Mosaic's 16 MB default at reference scale; v5e has 128 MB.
    need = (40 << 20) if not bwd else (100 << 20)
    return pltpu.CompilerParams(vmem_limit_bytes=need)


def _ffn_fwd(x, scale, bias, w1, b1, w2, b2, seed, rate, interpret):
    b, t, d = x.shape
    f = w1.shape[1]
    kernel = functools.partial(_fwd_kernel, rate=rate, hw=not interpret)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _const2d((1, d)),
            _const2d((1, d)),
            _const2d((d, f)),
            _const2d((1, f)),
            _const2d((f, d)),
            _const2d((1, d)),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
        **({} if interpret else
           {"compiler_params": _vmem_params(t, f, False)}),
    )(seed, x, scale.reshape(1, d), bias.reshape(1, d), w1,
      b1.reshape(1, f), w2, b2.reshape(1, d))
    return out, (x, scale, bias, w1, b1, w2, seed)


def _ffn_bwd(rate, interpret, res, g):
    x, scale, bias, w1, b1, w2, seed = res
    b, t, d = x.shape
    f = w1.shape[1]
    kernel = functools.partial(_bwd_kernel, rate=rate, hw=not interpret)
    f32 = jnp.float32
    dx, dscale_p, dbias_p, db1_p, db2_p, dw1, dw2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _const2d((1, d)),
            _const2d((1, d)),
            _const2d((d, f)),
            _const2d((1, f)),
            _const2d((f, d)),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _row(d),
            _row(d),
            _row(f),
            _row(d),
            _const2d((d, f)),
            _const2d((f, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((b, 1, f), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((d, f), f32),
            jax.ShapeDtypeStruct((f, d), f32),
        ],
        interpret=interpret,
        **({} if interpret else
           {"compiler_params": _vmem_params(t, f, True)}),
    )(seed, x, scale.reshape(1, d), bias.reshape(1, d), w1,
      b1.reshape(1, f), w2, g)
    return (
        dx,
        jnp.sum(dscale_p, axis=(0, 1)),
        jnp.sum(dbias_p, axis=(0, 1)),
        dw1.astype(w1.dtype),
        jnp.sum(db1_p, axis=(0, 1)),
        dw2.astype(w2.dtype),
        jnp.sum(db2_p, axis=(0, 1)),
        None,
    )


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def dropout_masks(b: int, t: int, d: int, f: int, seed, rate: float, *,
                  interpret: bool = False):
    """Reproduce the kernels' two per-program keep-masks (test hook).

    Returns (m1 [B,T,F], m2 [B,T,D]) — exactly the masks the fwd/bwd
    kernels generate for the same seed and backend."""

    def kern(seed_ref, m1_ref, m2_ref):
        pid = pl.program_id(0)
        m1, m2 = _site_masks(
            [(t, f), (t, d)], rate, seed_ref, pid, not interpret
        )
        m1_ref[0] = m1.astype(jnp.int8)
        m2_ref[0] = m2.astype(jnp.int8)

    m1, m2 = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((1, t, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, f), jnp.int8),
            jax.ShapeDtypeStruct((b, t, d), jnp.int8),
        ],
        interpret=interpret,
    )(seed)
    return m1.astype(bool), m2.astype(bool)


def fused_ffn(x, scale, bias, w1, b1, w2, b2, key, *,
              dropout_rate: float = 0.0, train: bool = False,
              interpret: bool = False):
    """Fused FF module: x [B, T, D] → [B, T, D].

    Computes LN(scale, bias) → x@w1+b1 → SiLU → dropout → @w2+b2 →
    dropout, exactly the ``models/conformer.py::_ff_module`` pipeline
    (the 0.5 half-step scale, DropPath and residual stay outside).
    Dropout (training only) runs in-kernel — hardware PRNG compiled,
    counter-hash in interpret mode — seeded from ``key``; the VJP
    regenerates the same masks.
    """
    cdt = x.dtype
    rate = float(dropout_rate) if train else 0.0
    if rate > 0.0:
        seed = jax.random.randint(
            key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _ffn(
        x,
        scale.astype(jnp.float32), bias.astype(jnp.float32),
        w1.astype(cdt), b1.astype(jnp.float32),
        w2.astype(cdt), b2.astype(jnp.float32),
        seed, rate, interpret,
    )
