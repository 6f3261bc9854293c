"""Fused multi-head self-attention Pallas kernel for the Conformer.

Replaces the naive einsum attention (``models/conformer.py::_attention``,
torch ``nn.MultiheadAttention`` semantics from the reference
``transformer_ctc.py:194-263``) on the bf16 TPU fast path. The profiled
cost of the naive path at reference scale (B=64, T'=313, D=1024, H=8) is
~54 ms/step of [B,H,T,T] score/prob materialization to HBM plus ~15 ms of
attention-prob dropout draws; this kernel keeps the whole (scores →
key-padding mask → softmax → dropout → @V) pipeline in VMEM per (batch,
head) program and never writes the [T,T] intermediates to HBM.

Design:
  * grid over B*H programs; per program the [Tp, dh] q/k/v blocks and the
    [Tp, Tp] score matrix live entirely in VMEM (Tp ≈ 320 → ~1 MB);
  * key-padding mask from per-program sequence lengths (SMEM);
  * softmax statistics in f32; matmuls accumulate in f32 on the MXU;
  * dropout on attention probabilities via an in-kernel counter-based hash
    (murmur3-style over (seed, program, row, col)) — the backward kernel
    regenerates the identical mask, so no [B,H,T,T] mask is ever stored,
    and the bits are backend-portable (the TPU interpreter stubs
    ``pltpu.prng_random_bits`` to zeros, so the hardware PRNG is untestable
    on CPU);
  * custom VJP: backward recomputes probs (flash-style rematerialization)
    and produces dq/dk/dv in one kernel launch.

The pure-JAX twin (``mhsa_reference``) is the correctness oracle: the
kernel must match it exactly for dropout_rate=0, and match its
distributional properties under dropout.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # matches the naive path's additive mask (conformer.py)


def _pad_t(t: int) -> int:
    """Pad the time axis to a lane-friendly multiple of 128."""
    return ((t + 127) // 128) * 128


def mhsa_reference(q, k, v, lens, *, dropout_rate: float = 0.0, seed=None,
                   left_context: int | None = None):
    """Pure-JAX oracle: [B,H,T,dh] q/k/v, lens [B] (None = no mask).

    Matches ``models/conformer.py::_attention`` exactly (same mask constant,
    same f32 softmax) for dropout_rate=0; dropout here is only for
    distribution-level tests (different bits than the kernel PRNG).
    """
    b, h, t, dh = q.shape
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    if lens is not None:
        pad = jnp.arange(t)[None, :] >= lens[:, None]  # [B, T] True = pad
        scores = jnp.where(pad[:, None, None, :], NEG, scores)
    if left_context is not None:
        qi = jnp.arange(t)[:, None]
        kj = jnp.arange(t)[None, :]
        band = (kj <= qi) & (qi - kj <= left_context)
        scores = jnp.where(band[None, None, :, :], scores, NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(
        jnp.max(scores, axis=-1, keepdims=True) <= NEG, 0.0, probs
    )
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(
            jax.random.key(seed if seed is not None else 0),
            1.0 - dropout_rate, probs.shape,
        )
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _keep_mask(shape, rate: float, seed, pid):
    """Bernoulli(1-rate) keep mask, counter-based (murmur3-style finalizer
    over (seed, program, row, col) — ops/hashrng.py, shared with the XLA-
    level hash dropout).

    Stateless and backend-portable: identical bits on TPU and in interpret
    mode, regenerated exactly by the backward kernel — no [B,H,T,T] mask is
    ever stored. A few VPU integer ops per element, negligible next to the
    MXU matmuls (and far cheaper than the XLA-level RNG the naive path pays
    for [B,H,T,T] dropout draws).
    """
    from ..hashrng import keep_mask2d

    return keep_mask2d(seed, pid, shape, rate)


def _probs_for(q, kt, length, t, scale, left):
    """Masked softmax probabilities for one (batch, head) program. f32.

    Matmul runs in the input dtype with f32 accumulation and the 1/√dh
    scaling applied afterwards — the same op order as the naive einsum path,
    so fp32 inputs give bit-identical scores. ``left`` (static) adds the
    causal banded mask: query i sees keys in [i - left, i] (the streaming-
    compatible Conformer's finite left context, conformer.py::_attention).
    """
    tp = q.shape[0]
    scores = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    limit = jnp.minimum(length, t)
    scores = jnp.where(col >= limit, NEG, scores)
    if left is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
        band = (col <= row) & (row - col <= left)
        scores = jnp.where(band, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    # Fully-masked rows (band + padding can mask every key for rows past
    # the valid length) get zero probs instead of a shape-dependent
    # uniform — deterministic, oracle-matched, and grad-clean.
    return jnp.where(m <= NEG, 0.0, p)


def _fwd_kernel(lens_ref, seed_ref, q_ref, kt_ref, v_ref, o_ref, *,
                t: int, rate: float, scale: float, left):
    pid = pl.program_id(0)
    probs = _probs_for(q_ref[0], kt_ref[0], lens_ref[pid], t, scale, left)
    if rate > 0.0:
        keep = _keep_mask(probs.shape, rate, seed_ref[0], pid)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(q_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(lens_ref, seed_ref, q_ref, kt_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, t: int, rate: float,
                scale: float, left):
    pid = pl.program_id(0)
    q, kt, v, g = q_ref[0], kt_ref[0], v_ref[0], g_ref[0]
    probs = _probs_for(q, kt, lens_ref[pid], t, scale, left)  # f32 [Tp, Tp]
    if rate > 0.0:
        keep = _keep_mask(probs.shape, rate, seed_ref[0], pid)  # = forward
        inv = 1.0 / (1.0 - rate)
        dropped = jnp.where(keep, probs * inv, 0.0)
    else:
        keep = None
        dropped = probs

    f32 = jnp.float32
    # dV = droppedᵀ @ g
    dv_ref[0] = jax.lax.dot_general(
        dropped.astype(g.dtype), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dv_ref.dtype)
    # dP = g @ vᵀ (through dropout: zeroed where dropped, scaled where kept)
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    if rate > 0.0:
        dp = jnp.where(keep, dp * (1.0 / (1.0 - rate)), 0.0)
    # softmax VJP: dS = P ⊙ (dP − rowsum(dP ⊙ P))
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    # dQ = dS @ K · scale ; K = ktᵀ → dS @ ktᵀ
    dq_ref[0] = (jax.lax.dot_general(
        ds, kt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * scale).astype(dq_ref.dtype)
    # dK = dSᵀ @ Q · scale, written transposed to match ktᵀ layout [dh, Tp]:
    # d(kt) = (dSᵀ @ Q)ᵀ · scale = Qᵀ @ dS · scale
    dk_ref[0] = (jax.lax.dot_general(
        q, ds, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * scale).astype(dk_ref.dtype)


def _kt_spec(tp: int, dh: int):
    return pl.BlockSpec((1, dh, tp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def dropout_masks(bh: int, tp: int, seed, rate: float, *,
                  interpret: bool = False):
    """Reproduce the kernels' per-program dropout keep-masks (test hook).

    Returns bool [bh, tp, tp] — exactly the masks `_fwd_kernel`/`_bwd_kernel`
    generate for the same seed, enabling exact oracle comparison under
    dropout.
    """

    def kern(seed_ref, out_ref):
        out_ref[0] = _keep_mask(
            (tp, tp), rate, seed_ref[0], pl.program_id(0)
        ).astype(jnp.int8)

    out = pl.pallas_call(
        kern,
        grid=(bh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tp, tp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tp, tp), jnp.int8),
        interpret=interpret,
    )(seed)
    return out.astype(bool)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(q, k, v, lens_bh, seed, rate, interpret, left):
    out, _ = _fused_fwd(q, k, v, lens_bh, seed, rate, interpret, left)
    return out


def _call_fwd(q, kt, v, lens_bh, seed, rate, interpret, left):
    bh, tp, dh = q.shape
    t = tp  # q/k/v already padded; real-length masking comes via lens_bh
    kernel = functools.partial(
        _fwd_kernel, t=t, rate=rate, scale=1.0 / math.sqrt(dh), left=left
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        _kt_spec(tp, dh),
        pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tp, dh), q.dtype),
        interpret=interpret,
    )(lens_bh, seed, q, kt, v)


def _fused_fwd(q, k, v, lens_bh, seed, rate, interpret, left):
    kt = jnp.swapaxes(k, -1, -2)  # [BH, dh, Tp] — both matmul operands
    out = _call_fwd(q, kt, v, lens_bh, seed, rate, interpret, left)
    return out, (q, kt, v, lens_bh, seed)


def _fused_bwd(rate, interpret, left, res, g):
    q, kt, v, lens_bh, seed = res
    bh, tp, dh = q.shape
    kernel = functools.partial(
        _bwd_kernel, t=tp, rate=rate, scale=1.0 / math.sqrt(dh), left=left
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        _kt_spec(tp, dh),
        pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq, dkt, dv = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _kt_spec(tp, dh),
            pl.BlockSpec((1, tp, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tp, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, dh, tp), q.dtype),
            jax.ShapeDtypeStruct((bh, tp, dh), q.dtype),
        ],
        interpret=interpret,
    )(lens_bh, seed, q, kt, v, g)
    dk = jnp.swapaxes(dkt, -1, -2)
    return dq, dk, dv, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mhsa(
    q, k, v, lens, key, *, dropout_rate: float = 0.0, train: bool = False,
    interpret: bool = False, left_context: int | None = None,
):
    """Fused attention: q/k/v [B, H, T, dh], lens [B] or None.

    Returns [B, H, T, dh]. Pads T internally to a multiple of 128. Dropout
    (training only) runs inside the kernel with the TPU PRNG, seeded from
    ``key``. ``left_context`` (static) applies the causal banded mask —
    query i attends keys [i - left_context, i] — so the streaming-
    compatible Conformer variant trains on the fused path too.
    """
    b, h, t, dh = q.shape
    tp = _pad_t(t)
    pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
    qp = jnp.pad(q, pad).reshape(b * h, tp, dh)
    kp = jnp.pad(k, pad).reshape(b * h, tp, dh)
    vp = jnp.pad(v, pad).reshape(b * h, tp, dh)
    if lens is None:
        lens = jnp.full((b,), t, jnp.int32)
    lens_bh = jnp.repeat(lens.astype(jnp.int32), h)
    rate = float(dropout_rate) if train else 0.0
    if rate > 0.0:
        seed = jax.random.randint(
            key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _fused(qp, kp, vp, lens_bh, seed, rate, interpret, left_context)
    return out.reshape(b, h, tp, dh)[:, :, :t, :]
