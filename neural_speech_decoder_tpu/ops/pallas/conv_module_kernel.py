"""Fused Conformer conv-module Pallas kernel (round-5 experiment).

The conv module (``models/conformer.py::_conv_module``, reference
``transformer_ctc.py:148-191``) is LN → pointwise 2× expand → GLU →
depthwise conv k=31 → LN → SiLU → pointwise → dropout (+ residual
outside). Round-3 measured it at 5.87 ms fwd+bwd isolated vs a ~3.7 ms
matmul floor and RETIRED the would-be kernel by corollary from the
fused-FFN result; round-4's verdict demanded the corollary be replaced
with a measured full-step number (BASELINE.md "Fused-FFN experiment" —
isolated wins invert in-graph). This kernel exists to settle that:
``ConformerConfig.fused_conv`` opts in; the A/B lives in
``scripts/exp_conv_module_fullstep_ab.py`` and the verdict in
BASELINE.md.

Design (same scheme as ``ffn_kernel``):
  * grid ``(B,)``, one batch row per program; both pointwise weight
    matrices are grid-constant VMEM blocks (fetched once);
  * the depthwise k-tap conv runs in-register as k shifted
    multiply-adds over the zero-padded [T, D] GLU output (static
    slices only — Pallas TPU has no dynamic_slice on traced values);
    'same' padding offline, (k-1, 0) causal;
  * both LNs keep f32 statistics; matmuls accumulate f32 (matching
    ``_linear``); f32 sigmoid/SiLU (Mosaic mis-lowers bf16 silu);
  * dropout at the output site via the TPU hardware PRNG (counter-hash
    in interpret mode), regenerated — not stored — by the backward;
  * custom VJP: one backward kernel recomputes the forward and emits dx
    + all parameter grads; dW accumulators are grid-resident constant
    blocks, vector grads exit as [B, 1, ·] partials summed outside.

The pure-JAX twin (``conv_module_reference``) is the oracle; it matches
``_conv_module`` (minus residual/dropout) op for op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_kernel import _keep_mask
from .ffn_kernel import LN_EPS, _const2d, _norm, _row


def conv_module_reference(x, ln_s, ln_b, w1, b1, dw_w, dw_b, ln2_s, ln2_b,
                          w2, b2, *, causal: bool = False):
    """Pure-JAX oracle: the conv module without residual/dropout,
    matching ``models/conformer.py::_conv_module`` op for op."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + LN_EPS) * ln_s + ln_b).astype(
        x.dtype
    )
    h = jnp.einsum("...d,df->...f", xn, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = (h + b1.astype(jnp.float32)).astype(x.dtype)
    a, g = jnp.split(h, 2, axis=-1)
    h = (a.astype(jnp.float32) * jax.nn.sigmoid(g.astype(jnp.float32))
         ).astype(x.dtype)
    kw = dw_w.shape[0]
    pad = (kw - 1, 0) if causal else (kw // 2, kw // 2)
    h = (
        jax.lax.conv_general_dilated(
            h, dw_w[:, None, :].astype(h.dtype), (1,), [pad],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=h.shape[-1],
        ).astype(jnp.float32)
        + dw_b.astype(jnp.float32)
    ).astype(h.dtype)
    hf = h.astype(jnp.float32)
    mean2 = jnp.mean(hf, axis=-1, keepdims=True)
    var2 = jnp.var(hf, axis=-1, keepdims=True)
    hn = ((hf - mean2) * jax.lax.rsqrt(var2 + LN_EPS) * ln2_s + ln2_b
          ).astype(x.dtype)
    hs = hn.astype(jnp.float32)
    hn = (hs * jax.nn.sigmoid(hs)).astype(x.dtype)
    o = jnp.einsum("...d,de->...e", hn, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (o + b2.astype(jnp.float32)).astype(x.dtype)


def _glu_f32(h):
    d = h.shape[-1] // 2
    a = h[:, :d].astype(jnp.float32)
    g = h[:, d:].astype(jnp.float32)
    sig = jax.nn.sigmoid(g)
    return a * sig, a, sig


def _dwconv(h, w, kw: int, pad_l: int, pad_r: int, t: int):
    """Depthwise conv along T as k shifted MACs on the zero-padded block.

    h: [T, D] (cdt), w: [k, D] f32 taps. Returns f32 [T, D]."""
    hp = jnp.pad(h.astype(jnp.float32), ((pad_l, pad_r), (0, 0)))
    acc = hp[0:t] * w[0]
    for ki in range(1, kw):
        acc = acc + hp[ki : ki + t] * w[ki]
    return acc


def _fwd_kernel(seed_ref, x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, dww_ref,
                dwb_ref, ln2s_ref, ln2b_ref, w2_ref, b2_ref, o_ref, *,
                rate: float, hw: bool, kw: int, pad_l: int, pad_r: int):
    pid = pl.program_id(0)
    cdt = x_ref.dtype
    t = x_ref.shape[1]
    xf = x_ref[0].astype(jnp.float32)
    xn, _, _ = _norm(xf, lns_ref[0], lnb_ref[0])
    h = jax.lax.dot_general(
        xn.astype(cdt), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    hq = h.astype(cdt)
    glu, _, _ = _glu_f32(hq)
    gluq = glu.astype(cdt)
    c = _dwconv(gluq, dww_ref[:], kw, pad_l, pad_r, t) + dwb_ref[0]
    cq = c.astype(cdt)
    cn, _, _ = _norm(cq.astype(jnp.float32), ln2s_ref[0], ln2b_ref[0])
    cnb = cn.astype(cdt).astype(jnp.float32)
    s = (cnb * jax.nn.sigmoid(cnb)).astype(cdt)
    o = jax.lax.dot_general(
        s, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    if rate > 0.0:
        m = _keep_mask(o.shape, rate, seed_ref[0], pid, hw)
        o = jnp.where(m, o * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, dww_ref,
                dwb_ref, ln2s_ref, ln2b_ref, w2_ref, g_ref, dx_ref,
                dlns_ref, dlnb_ref, db1_ref, ddwb_ref, dln2s_ref,
                dln2b_ref, db2_ref, dw1_ref, ddww_ref, dw2_ref, *,
                rate: float, hw: bool, kw: int, pad_l: int, pad_r: int):
    pid = pl.program_id(0)
    f32 = jnp.float32
    cdt = x_ref.dtype
    t = x_ref.shape[1]

    # ---- forward recompute (same rounding sequence as _fwd_kernel) ----
    xf = x_ref[0].astype(f32)
    ln_s = lns_ref[0]
    _, xhat, rstd = _norm(xf, ln_s, lnb_ref[0])
    xn = (xhat * ln_s + lnb_ref[0]).astype(cdt)
    h = jax.lax.dot_general(
        xn, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[0]
    hq = h.astype(cdt)
    glu, a_f, sig_g = _glu_f32(hq)
    gluq = glu.astype(cdt)
    c = _dwconv(gluq, dww_ref[:], kw, pad_l, pad_r, t) + dwb_ref[0]
    cq = c.astype(cdt)
    ln2_s = ln2s_ref[0]
    _, chat, rstd2 = _norm(cq.astype(f32), ln2_s, ln2b_ref[0])
    cn = (chat * ln2_s + ln2b_ref[0]).astype(cdt)
    cnb = cn.astype(f32)
    sig_s = jax.nn.sigmoid(cnb)
    s = (cnb * sig_s).astype(cdt)

    # ---- backward ----
    g = g_ref[0].astype(f32)
    if rate > 0.0:
        m = _keep_mask(g.shape, rate, seed_ref[0], pid, hw)
        g = jnp.where(m, g * (1.0 / (1.0 - rate)), 0.0)
    db2_ref[0, 0] = jnp.sum(g, axis=0)

    @pl.when(pid == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        ddww_ref[:] = jnp.zeros_like(ddww_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    dw2_ref[:] += jax.lax.dot_general(
        s, g.astype(cdt), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    ds = jax.lax.dot_general(
        g.astype(cdt), w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    # SiLU'(cnb)
    dcn = ds * sig_s * (1.0 + cnb * (1.0 - sig_s))
    dln2s_ref[0, 0] = jnp.sum(dcn * chat, axis=0)
    dln2b_ref[0, 0] = jnp.sum(dcn, axis=0)
    dchat = dcn * ln2_s
    dc = rstd2 * (
        dchat
        - jnp.mean(dchat, axis=-1, keepdims=True)
        - chat * jnp.mean(dchat * chat, axis=-1, keepdims=True)
    )
    ddwb_ref[0, 0] = jnp.sum(dc, axis=0)
    # depthwise conv backward: dglu[t] = sum_k dc[t + pad_l - k] * w[k]
    # (correlation with the flipped kernel); dW[k] = sum_t dc[t] *
    # glu[t + k - pad_l].
    dcp = jnp.pad(dc, ((pad_r, pad_l), (0, 0)))
    w = dww_ref[:]
    dglu = dcp[kw - 1 : kw - 1 + t] * w[0]
    for ki in range(1, kw):
        dglu = dglu + dcp[kw - 1 - ki : kw - 1 - ki + t] * w[ki]
    glup = jnp.pad(glu, ((pad_l, pad_r), (0, 0)))
    ddww_ref[:] += jnp.stack(
        [jnp.sum(dc * glup[ki : ki + t], axis=0) for ki in range(kw)]
    )
    # GLU backward: glu = a * sigmoid(g)
    da = dglu * sig_g
    dg = dglu * a_f * sig_g * (1.0 - sig_g)
    dh = jnp.concatenate([da, dg], axis=-1)
    db1_ref[0, 0] = jnp.sum(dh, axis=0)
    dhq = dh.astype(cdt)
    dw1_ref[:] += jax.lax.dot_general(
        xn, dhq, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dxn = jax.lax.dot_general(
        dhq, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    dlns_ref[0, 0] = jnp.sum(dxn * xhat, axis=0)
    dlnb_ref[0, 0] = jnp.sum(dxn, axis=0)
    dxhat = dxn * ln_s
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _vmem_params(bwd: bool):
    return pltpu.CompilerParams(
        vmem_limit_bytes=(48 << 20) if not bwd else (110 << 20)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def _conv_mod(x, ln_s, ln_b, w1, b1, dw_w, dw_b, ln2_s, ln2_b, w2, b2,
              seed, rate, causal, interpret):
    out, _ = _conv_mod_fwd(x, ln_s, ln_b, w1, b1, dw_w, dw_b, ln2_s, ln2_b,
                           w2, b2, seed, rate, causal, interpret)
    return out


def _pads(kw: int, causal: bool):
    return (kw - 1, 0) if causal else (kw // 2, kw - 1 - (kw // 2))


def _conv_mod_fwd(x, ln_s, ln_b, w1, b1, dw_w, dw_b, ln2_s, ln2_b, w2, b2,
                  seed, rate, causal, interpret):
    b, t, d = x.shape
    f = w1.shape[1]
    kw = dw_w.shape[0]
    pad_l, pad_r = _pads(kw, causal)
    kernel = functools.partial(
        _fwd_kernel, rate=rate, hw=not interpret, kw=kw, pad_l=pad_l,
        pad_r=pad_r,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _const2d((1, d)), _const2d((1, d)),
            _const2d((d, f)), _const2d((1, f)),
            _const2d((kw, d)), _const2d((1, d)),
            _const2d((1, d)), _const2d((1, d)),
            _const2d((d, d)), _const2d((1, d)),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
        **({} if interpret else {"compiler_params": _vmem_params(False)}),
    )(seed, x, ln_s.reshape(1, d), ln_b.reshape(1, d), w1,
      b1.reshape(1, f), dw_w, dw_b.reshape(1, d), ln2_s.reshape(1, d),
      ln2_b.reshape(1, d), w2, b2.reshape(1, d))
    return out, (x, ln_s, ln_b, w1, b1, dw_w, dw_b, ln2_s, ln2_b, w2, seed)


def _conv_mod_bwd(rate, causal, interpret, res, g):
    x, ln_s, ln_b, w1, b1, dw_w, dw_b, ln2_s, ln2_b, w2, seed = res
    b, t, d = x.shape
    f = w1.shape[1]
    kw = dw_w.shape[0]
    pad_l, pad_r = _pads(kw, causal)
    kernel = functools.partial(
        _bwd_kernel, rate=rate, hw=not interpret, kw=kw, pad_l=pad_l,
        pad_r=pad_r,
    )
    f32 = jnp.float32
    (dx, dlns_p, dlnb_p, db1_p, ddwb_p, dln2s_p, dln2b_p, db2_p, dw1,
     ddww, dw2) = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _const2d((1, d)), _const2d((1, d)),
            _const2d((d, f)), _const2d((1, f)),
            _const2d((kw, d)), _const2d((1, d)),
            _const2d((1, d)), _const2d((1, d)),
            _const2d((d, d)),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _row(d), _row(d), _row(f), _row(d), _row(d), _row(d), _row(d),
            _const2d((d, f)),
            _const2d((kw, d)),
            _const2d((d, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((b, 1, f), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((d, f), f32),
            jax.ShapeDtypeStruct((kw, d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
        ],
        interpret=interpret,
        **({} if interpret else {"compiler_params": _vmem_params(True)}),
    )(seed, x, ln_s.reshape(1, d), ln_b.reshape(1, d), w1,
      b1.reshape(1, f), dw_w, dw_b.reshape(1, d), ln2_s.reshape(1, d),
      ln2_b.reshape(1, d), w2, g)
    return (
        dx,
        jnp.sum(dlns_p, axis=(0, 1)),
        jnp.sum(dlnb_p, axis=(0, 1)),
        dw1.astype(w1.dtype),
        jnp.sum(db1_p, axis=(0, 1)),
        ddww.astype(dw_w.dtype),
        jnp.sum(ddwb_p, axis=(0, 1)),
        jnp.sum(dln2s_p, axis=(0, 1)),
        jnp.sum(dln2b_p, axis=(0, 1)),
        dw2.astype(w2.dtype),
        jnp.sum(db2_p, axis=(0, 1)),
        None,  # seed
    )


_conv_mod.defvjp(_conv_mod_fwd, _conv_mod_bwd)


def fused_conv_module(x, ln_s, ln_b, w1, b1, dw_w, dw_b, ln2_s, ln2_b, w2,
                      b2, key, *, dropout_rate: float = 0.0,
                      train: bool = False, causal: bool = False,
                      interpret: bool = False):
    """Fused conv module (pre-residual): x [B, T, D] → [B, T, D].

    LN → x@w1+b1 → GLU → depthwise(kw) → LN → SiLU → @w2+b2 → dropout —
    exactly ``models/conformer.py::_conv_module`` minus the residual add
    (kept outside, matching the module's ``residual + h``)."""
    cdt = x.dtype
    rate = float(dropout_rate) if train else 0.0
    if rate > 0.0:
        seed = jax.random.randint(
            key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    f32 = jnp.float32
    return _conv_mod(
        x, ln_s.astype(f32), ln_b.astype(f32), w1.astype(cdt),
        b1.astype(f32), dw_w.astype(f32), dw_b.astype(f32),
        ln2_s.astype(f32), ln2_b.astype(f32), w2.astype(cdt),
        b2.astype(f32), seed, rate, causal, interpret,
    )
