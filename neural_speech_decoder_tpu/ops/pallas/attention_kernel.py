"""Fused multi-head self-attention Pallas kernel for the Conformer.

Replaces the naive einsum attention (``models/conformer.py::_attention``,
torch ``nn.MultiheadAttention`` semantics from the reference
``transformer_ctc.py:194-263``) on the bf16 TPU fast path. The profiled
cost of the naive path at reference scale (B=64, T'=313, D=1024, H=8) is
~54 ms/step of [B,H,T,T] score/prob materialization to HBM plus ~15 ms of
attention-prob dropout draws; this kernel keeps the whole (scores →
key-padding mask → softmax → dropout → @V) pipeline in VMEM per (batch,
head) program and never writes the [T,T] intermediates to HBM.

Design (round-3 layout rework):
  * the kernel consumes the qkv projection's **natural output layout**
    ``[B, Tp, 3·D]`` directly: the per-(batch, head) program picks its
    q/k/v ``[Tp, dh]`` column blocks via BlockSpec index maps (the same
    array is passed three times with different column maps), and writes
    its context straight into the head-major ``[B, Tp, D]`` output the
    out-projection consumes. Measured motivation: the former
    ``[B,T,3D] → 3×[B,H,T,dh]`` head-split transposes cost 2.8 ms per
    block at reference scale — more than the attention math itself —
    and the kernel-internal ``kt`` pre-transpose and output
    back-transpose doubled that. None of those copies exist now; scores
    contract q·k on dh in-kernel (MXU handles the k-transposed operand
    natively);
  * grid ``(B, H)``; per program the [Tp, dh] q/k/v blocks and the
    [Tp, Tp] score matrix live entirely in VMEM (Tp ≈ 384 → ~1 MB);
  * both qkv column orders are supported: torch-canonical
    ``({q,k,v}, head, dh)`` and the per-head-interleaved
    ``(head, {q,k,v}, dh)`` tensor-parallel layout
    (``parallel/shardings.py::interleave_attention_params``) — under
    head-parallel TP each 'model' shard's local columns are whole heads,
    so the kernel runs unchanged on the shard-local array;
  * key-padding mask from per-batch sequence lengths (SMEM);
  * softmax statistics in f32; matmuls accumulate in f32 on the MXU;
  * dropout on attention probabilities in-kernel: the TPU hardware PRNG
    re-seeded per (seed, program id) on the compiled path, the
    counter-based murmur3 hash in interpret mode (backend-portable bits
    for CPU tests — the interpreter stubs ``pltpu.prng_random_bits`` to
    zeros). In both modes the backward kernel regenerates the identical
    mask, so no [B,H,T,T] mask is ever stored; compiled and interpreted
    bits DIFFER by design (see ``_keep_mask``);
  * custom VJP: backward recomputes probs (flash-style rematerialization)
    and produces the full dqkv in one kernel launch.

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


def _keep_mask(shape, rate: float, seed, pid, hw: bool = False):
    """Bernoulli(1-rate) keep mask, deterministic per (seed, program).

    ``hw=True`` (compiled TPU path): the per-core hardware PRNG, seeded
    with (seed, program id) — one generator op for the whole [Tp, Tp]
    tile. Measured motivation: the murmur3 hash costs ~15 VPU int ops
    per element, ~1.4 ms per kernel call at reference scale (B·H=512
    programs × 384² elements) — more than the kernel's matmuls; the
    hardware PRNG makes it ~free. Re-seeding with the same (seed, pid)
    in the backward kernel regenerates the identical mask, so no
    [B,H,T,T] mask is ever stored.

    ``hw=False`` (interpret mode, i.e. CPU tests): the counter-based
    murmur3-style hash over (seed, program, row, col) from
    ``ops/hashrng.py`` — backend-portable bits the tests can reproduce
    exactly (the TPU interpreter stubs ``pltpu.prng_random_bits`` to
    zeros, so the hardware PRNG is untestable off-TPU). Forward/backward
    parity holds identically in both modes.
    """
    if hw:
        pltpu.prng_seed(seed, pid)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        # P(bits >= rate·2³²) = 1 − rate
        thresh = np.uint32(min(int(rate * 2.0**32), 2**32 - 1))
        return bits >= thresh
    from ..hashrng import keep_mask2d

    return keep_mask2d(seed, pid, shape, rate)


def _probs_for(q, k, length, t, scale, left):
    """Masked softmax probabilities for one (batch, head) program. f32.

    ``q``/``k`` are the natural [Tp, dh] blocks; the score matmul
    contracts dh on both operands (A·Bᵀ — native on the MXU, no
    materialized transpose) in the input dtype with f32 accumulation, the
    1/√dh scaling applied afterwards — the same op order as the naive
    einsum path, so fp32 inputs give bit-identical scores. ``left``
    (static) adds the causal banded mask: query i sees keys in
    [i - left, i] (the streaming-compatible Conformer's finite left
    context, conformer.py::_attention).
    """
    tp = q.shape[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
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


def _pid(nh: int):
    """Flattened (batch, head) program id ``b*H + h`` — the dropout
    stream index (hash counter in interpret mode, PRNG seed component on
    TPU); matches the pre-rework 1-D grid's program id, so
    interpret-mode hash bits are unchanged across the layout rework
    (compiled-path bits changed when dropout moved to the hardware
    PRNG)."""
    return pl.program_id(0) * nh + pl.program_id(1)


def _fwd_kernel(lens_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                t: int, rate: float, scale: float, left, nh: int,
                hw: bool):
    probs = _probs_for(
        q_ref[0], k_ref[0], lens_ref[pl.program_id(0)], t, scale, left
    )
    if rate > 0.0:
        keep = _keep_mask(probs.shape, rate, seed_ref[0], _pid(nh), hw)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(q_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(lens_ref, seed_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, t: int, rate: float,
                scale: float, left, nh: int, hw: bool):
    q, k, v, g = q_ref[0], k_ref[0], v_ref[0], g_ref[0]
    probs = _probs_for(
        q, k, lens_ref[pl.program_id(0)], t, scale, left
    )  # f32 [Tp, Tp]
    if rate > 0.0:
        keep = _keep_mask(probs.shape, rate, seed_ref[0], _pid(nh), hw)
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
    # dQ = dS @ K · scale
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * scale).astype(dq_ref.dtype)
    # dK = dSᵀ @ Q · scale
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * scale).astype(dk_ref.dtype)


def _qkv_maps(nh: int, interleaved: bool):
    """Column-block index maps (block units of dh) into [B, Tp, 3·D] for
    the q/k/v slices of head h.

    torch-canonical layout ({q,k,v}, head, dh): q at block h, k at nh+h,
    v at 2·nh+h. Interleaved TP layout (head, {q,k,v}, dh): 3h / 3h+1 /
    3h+2.
    """
    if interleaved:
        return (
            lambda b, h: (b, 0, 3 * h),
            lambda b, h: (b, 0, 3 * h + 1),
            lambda b, h: (b, 0, 3 * h + 2),
        )
    return (
        lambda b, h: (b, 0, h),
        lambda b, h: (b, 0, nh + h),
        lambda b, h: (b, 0, 2 * nh + h),
    )


def dropout_masks(bh: int, tp: int, seed, rate: float, *,
                  interpret: bool = False):
    """Reproduce the kernels' per-program dropout keep-masks (test hook).

    Returns bool [bh, tp, tp] — exactly the masks `_fwd_kernel`/`_bwd_kernel`
    generate for the same seed (program id = b*H + h) and the same
    backend (hardware PRNG compiled, counter-hash in interpret mode),
    enabling exact oracle comparison under dropout.
    """

    def kern(seed_ref, out_ref):
        out_ref[0] = _keep_mask(
            (tp, tp), rate, seed_ref[0], pl.program_id(0), not interpret
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused(qkv, lens, seed, nh, rate, interpret, left, interleaved):
    out, _ = _fused_fwd(qkv, lens, seed, nh, rate, interpret, left,
                        interleaved)
    return out


def _block_spec(tp, dh, index_map):
    return pl.BlockSpec((1, tp, dh), index_map, memory_space=pltpu.VMEM)


def _call_fwd(qkv, lens, seed, nh, rate, interpret, left, interleaved):
    b, tp, d3 = qkv.shape
    dh = d3 // (3 * nh)
    kernel = functools.partial(
        _fwd_kernel, t=tp, rate=rate, scale=1.0 / math.sqrt(dh), left=left,
        nh=nh, hw=not interpret,
    )
    qm, km, vm = _qkv_maps(nh, interleaved)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _block_spec(tp, dh, qm),
        _block_spec(tp, dh, km),
        _block_spec(tp, dh, vm),
    ]
    return pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=_block_spec(tp, dh, lambda i, h: (i, 0, h)),
        out_shape=jax.ShapeDtypeStruct((b, tp, nh * dh), qkv.dtype),
        interpret=interpret,
    )(lens, seed, qkv, qkv, qkv)


def _fused_fwd(qkv, lens, seed, nh, rate, interpret, left, interleaved):
    out = _call_fwd(qkv, lens, seed, nh, rate, interpret, left, interleaved)
    return out, (qkv, lens, seed)


def _fused_bwd(nh, rate, interpret, left, interleaved, res, g):
    qkv, lens, seed = res
    b, tp, d3 = qkv.shape
    dh = d3 // (3 * nh)
    kernel = functools.partial(
        _bwd_kernel, t=tp, rate=rate, scale=1.0 / math.sqrt(dh), left=left,
        nh=nh, hw=not interpret,
    )
    qm, km, vm = _qkv_maps(nh, interleaved)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _block_spec(tp, dh, qm),
        _block_spec(tp, dh, km),
        _block_spec(tp, dh, vm),
        _block_spec(tp, dh, lambda i, h: (i, 0, h)),
    ]
    out_spec = _block_spec(tp, dh, lambda i, h: (i, 0, h))
    shp = jax.ShapeDtypeStruct((b, tp, nh * dh), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[shp, shp, shp],
        interpret=interpret,
    )(lens, seed, qkv, qkv, qkv, g)
    if interleaved:
        # head-major [B,Tp,D] grads → (head, {q,k,v}, dh) columns
        d = nh * dh
        dqkv = jnp.stack(
            [z.reshape(b, tp, nh, dh) for z in (dq, dk, dv)], axis=3
        ).reshape(b, tp, 3 * d)
    else:
        dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mhsa_qkv(
    qkv, lens, key, *, num_heads: int, dropout_rate: float = 0.0,
    train: bool = False, interpret: bool = False,
    left_context: int | None = None, interleaved: bool = False,
):
    """Fused attention over the qkv projection's natural output.

    ``qkv`` is [B, T, 3·D] (D = num_heads·dh) in torch-canonical
    ({q,k,v}, head, dh) column order, or per-head-interleaved
    (head, {q,k,v}, dh) order when ``interleaved=True`` (the tensor-
    parallel layout — under head TP pass the shard-local array and local
    ``num_heads``). Returns the head-major context [B, T, D] ready for
    the out projection — no [B,H,T,dh] intermediate exists anywhere.

    Pads T internally to a multiple of 128. Dropout (training only) runs
    inside the kernel with the counter-hash PRNG, seeded from ``key``.
    ``left_context`` (static) applies the causal banded mask — query i
    attends keys [i - left_context, i] — so the streaming-compatible
    Conformer variant trains on the fused path too.
    """
    b, t, d3 = qkv.shape
    tp = _pad_t(t)
    qkv_p = jnp.pad(qkv, [(0, 0), (0, tp - t), (0, 0)])
    if lens is None:
        lens = jnp.full((b,), t, jnp.int32)
    lens = lens.astype(jnp.int32)
    rate = float(dropout_rate) if train else 0.0
    if rate > 0.0:
        seed = jax.random.randint(
            key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _fused(qkv_p, lens, seed, num_heads, rate, interpret,
                 left_context, interleaved)
    return out[:, :t, :]


def fused_mhsa(
    q, k, v, lens, key, *, dropout_rate: float = 0.0, train: bool = False,
    interpret: bool = False, left_context: int | None = None,
):
    """Head-split compat API: q/k/v [B, H, T, dh], lens [B] or None.

    Returns [B, H, T, dh]. Thin wrapper over ``fused_mhsa_qkv`` (assembles
    the canonical [B, T, 3D] layout, which costs transposes — production
    code passes the projection output to ``fused_mhsa_qkv`` directly; this
    entry exists for tests and ad-hoc use)."""
    b, h, t, dh = q.shape

    def flat(z):  # [B,H,T,dh] -> [B,T,H*dh] head-major
        return z.transpose(0, 2, 1, 3).reshape(b, t, h * dh)

    qkv = jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)
    out = fused_mhsa_qkv(
        qkv, lens, key, num_heads=h, dropout_rate=dropout_rate, train=train,
        interpret=interpret, left_context=left_context,
    )
    return out.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
