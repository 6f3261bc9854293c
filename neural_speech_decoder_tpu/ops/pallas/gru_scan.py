"""Pallas TPU kernel: full GRU-layer time scan with VMEM-resident weights.

Motivation (measured on v5e at reference scale, B=64, H=1024, L=312):
the XLA ``lax.scan`` recurrence spends ~19 us/step because the ``[H, 3H]``
recurrent weight (6 MB bf16 per direction) is re-fetched from HBM on every
step. This kernel pins the weight block in VMEM for the whole sequence
(the BlockSpec index map depends only on the direction axis, so the Pallas
pipeline never re-fetches it), streams the per-step input projections
``xp_t`` in and hidden states out through the auto-double-buffered pipeline,
and keeps the carried hidden state in a VMEM scratch accumulator in float32.

Grid: ``(D, L)`` — directions outer, time inner (TPU iterates the last grid
axis fastest), so the hidden-state scratch resets at ``l == 0`` of each
direction and the weight block swaps only once.

The backward kernel walks time in reverse via index maps ``l -> L-1-l``,
carries only ``dh`` (f32 scratch), reads the gates the training forward
streamed out (store-gates: one [B,4H] block per step instead of an extra
``[B,H]x[H,3H]`` recompute matmul — ~1/3 of backward time at reference
scale), streams out ``dxp``, and accumulates ``dW_hh``/``db_hh`` in
VMEM-resident f32 output blocks. Same math as the pure-JAX custom VJP in
``models/gru.py``, which remains the CPU/fallback path and the correctness
oracle for these kernels.

Gate math (torch nn.GRU conventions, gate order r,z,n — model.py:50-57):
  r = sigmoid(x_r + h W_r + b_r);  z = sigmoid(x_z + h W_z + b_z)
  n = tanh(x_n + r * (h W_n + b_n));  h' = (1-z) n + z h
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_step_math(xp_ref, w_ref, b_ref, h_ref):
    """Shared per-step gate math. Returns (r, z, n, hp_n, h_new) in f32."""
    hdim = h_ref.shape[-1]
    h = h_ref[:]  # [B, H] float32 carry
    w = w_ref[0]  # [H, 3H], resident in VMEM across the whole direction
    hp = (
        jnp.dot(h.astype(w.dtype), w, preferred_element_type=jnp.float32)
        + b_ref[0, 0].astype(jnp.float32)
    )
    xp_t = xp_ref[0, 0].astype(jnp.float32)  # [B, 3H]
    r = jax.nn.sigmoid(xp_t[:, :hdim] + hp[:, :hdim])
    z = jax.nn.sigmoid(xp_t[:, hdim : 2 * hdim] + hp[:, hdim : 2 * hdim])
    hp_n = hp[:, 2 * hdim :]
    n = jnp.tanh(xp_t[:, 2 * hdim :] + r * hp_n)
    h_new = (1.0 - z) * n + z * h
    return r, z, n, hp_n, h_new


def _fwd_kernel(xp_ref, w_ref, b_ref, ys_ref, h_ref):
    """Primal-only forward (inference): streams hidden states only."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    *_, h_new = _gru_step_math(xp_ref, w_ref, b_ref, h_ref)
    h_ref[:] = h_new
    ys_ref[0, 0] = h_new.astype(ys_ref.dtype)


def _fwd_gates_kernel(xp_ref, w_ref, b_ref, ys_ref, gates_ref, h_ref):
    """Training forward: additionally streams the gates the backward needs.

    Store-gates: the backward pass needs (r, z, n, hp_n); streaming them
    out here (one [B,4H] block/step, ~0.4 ms HBM traffic per layer) is
    cheaper than recomputing hp via an extra [B,H]x[H,3H] matmul per
    backward step (~2 ms/layer at reference scale)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    r, z, n, hp_n, h_new = _gru_step_math(xp_ref, w_ref, b_ref, h_ref)
    h_ref[:] = h_new
    ys_ref[0, 0] = h_new.astype(ys_ref.dtype)
    gates_ref[0, 0] = jnp.concatenate([r, z, n, hp_n], axis=-1).astype(
        gates_ref.dtype
    )


def _bwd_kernel(
    gates_ref, ys_ref, dys_ref, wt_ref,
    dxp_ref, dw_ref, db_ref, dh_ref,
):
    """Reverse-time step. Streams out ``dxp`` (gate grads w.r.t. the input
    projections) and accumulates ``dW_hh`` / ``db_hh`` directly in VMEM-
    resident f32 output blocks (revisited across the whole direction) — the
    alternative, streaming per-step gate grads to HBM and contracting them
    afterwards, costs a ~6 ms XLA einsum per layer plus the extra stream.

    Gates (r, z, n, hp_n) are read from the forward kernel's stream instead
    of recomputed — drops the per-step ``[B,H]x[H,3H]`` recompute matmul
    (~1/3 of backward time) for one extra [B,4H] block read.

    ``wt`` is the pre-transposed weight so the ``dhp @ W^T`` product is a
    plain MXU matmul — contracting the second dim of a VMEM-resident W
    would re-transpose 6 MB every step (~2x kernel time)."""
    hdim = dh_ref.shape[-1]
    l = pl.program_id(1)  # 0 .. L-1, but blocks are index-mapped to L-1-l

    @pl.when(l == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # h_{t-1}: block index-mapped to max(t-1, 0); zero at t == 0.
    n_l = pl.num_programs(1)
    is_first_step = l == n_l - 1  # reversed walk: t == 0
    hprev = jnp.where(is_first_step, 0.0, ys_ref[0, 0].astype(jnp.float32))
    dh_tot = dh_ref[:] + dys_ref[0, 0].astype(jnp.float32)

    gates = gates_ref[0, 0].astype(jnp.float32)
    r = gates[:, :hdim]
    z = gates[:, hdim : 2 * hdim]
    n = gates[:, 2 * hdim : 3 * hdim]
    hp_n = gates[:, 3 * hdim :]

    dz = dh_tot * (hprev - n)
    dn = dh_tot * (1.0 - z)
    da_n = dn * (1.0 - n * n)
    dr = da_n * hp_n
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)
    dhp_n = da_n * r
    dhp = jnp.concatenate([da_r, da_z, dhp_n], axis=-1).astype(dxp_ref.dtype)
    dxp_ref[0, 0] = jnp.concatenate(
        [da_r, da_z, da_n], axis=-1
    ).astype(dxp_ref.dtype)
    # dW_hh += h_{t-1}^T @ dhp ; db_hh += sum_b dhp  (f32 accumulators)
    dw_ref[0] += jax.lax.dot_general(
        hprev.astype(dxp_ref.dtype),
        dhp,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[0, 0] += jnp.sum(dhp.astype(jnp.float32), axis=0)
    # dh_{t-1} = dh_t * z + dhp @ W^T
    dh_ref[:] = dh_tot * z + jnp.dot(
        dhp.astype(wt_ref.dtype), wt_ref[0], preferred_element_type=jnp.float32
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_sequence(xp, w_hh, b_hh, interpret=False):
    """Bidirectional GRU layer over a full sequence, zero initial state.

    Args:
      xp: ``[L, D, B, 3H]`` precomputed input projections (+ b_ih) in
        NATURAL time order for both directions — the backward direction
        (D=1), if present, is walked in reverse by the kernel's block index
        maps, so no time-flip copies are needed on either side (two full
        [L,B,3H]+[L,B,H] flips per layer saved vs flipping in XLA).
      w_hh: ``[D, H, 3H]``; b_hh: ``[D, 3H]``.
      interpret: run in the Pallas interpreter (CPU tests).

    Returns: ``[L, D, B, H]`` hidden states in natural time order for both
    directions. Semantics identical to ``models.gru._gru_layer`` with
    ``h0 = 0`` (the reference's detached zero h0, model.py:104-119) modulo
    the flip convention: ``gru_sequence(xp)[..,1,..] ==
    flip(_gru_layer(flip(xp[..,1,..])))``.
    """
    return _forward(xp, w_hh, b_hh, interpret)


def _t_fwd(length):
    """Block time index at scan position li: forward for direction 0,
    reversed for direction 1."""
    return lambda di, li: (
        jnp.where(di == 0, li, length - 1 - li), di, 0, 0
    )


def _forward(xp, w_hh, b_hh, interpret, with_gates=False):
    length, d, b, three_h = xp.shape
    h = three_h // 3
    tmap = _t_fwd(length)
    out_specs = [pl.BlockSpec((1, 1, b, h), tmap)]
    out_shape = [jax.ShapeDtypeStruct((length, d, b, h), xp.dtype)]
    if with_gates:
        out_specs.append(pl.BlockSpec((1, 1, b, 4 * h), tmap))
        out_shape.append(
            jax.ShapeDtypeStruct((length, d, b, 4 * h), xp.dtype)
        )
    out = pl.pallas_call(
        _fwd_gates_kernel if with_gates else _fwd_kernel,
        grid=(d, length),
        in_specs=[
            pl.BlockSpec((1, 1, b, three_h), tmap),
            pl.BlockSpec((1, h, three_h), lambda di, li: (di, 0, 0)),
            pl.BlockSpec((1, 1, three_h), lambda di, li: (di, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, w_hh.astype(xp.dtype), b_hh[:, None, :])
    return out if with_gates else out[0]


def _backward(gates, w_hh, ys, dys, interpret):
    length, d, b, four_h = gates.shape
    h = four_h // 4
    three_h = 3 * h
    # Walk scan positions in reverse: s = L-1-li. Time index of scan
    # position s is s for direction 0 and L-1-s for direction 1.
    rev = lambda di, li: (
        jnp.where(di == 0, length - 1 - li, li), di, 0, 0
    )
    # h at scan position s-1 (the step's h_prev); clamped at the first scan
    # position (s == 0), where the kernel substitutes h_prev = 0.
    rev_prev = lambda di, li: (
        jnp.where(
            di == 0,
            jnp.maximum(length - 2 - li, 0),
            jnp.minimum(li + 1, length - 1),
        ),
        di, 0, 0,
    )
    wt_c = jnp.transpose(w_hh.astype(gates.dtype), (0, 2, 1))
    dxp, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=(d, length),
        in_specs=[
            pl.BlockSpec((1, 1, b, four_h), rev),
            pl.BlockSpec((1, 1, b, h), rev_prev),
            pl.BlockSpec((1, 1, b, h), rev),
            pl.BlockSpec((1, three_h, h), lambda di, li: (di, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, b, three_h), rev),
            # dW/db accumulator blocks are revisited for the whole direction
            # (index depends only on d), so they live in VMEM until the
            # direction completes.
            pl.BlockSpec((1, h, three_h), lambda di, li: (di, 0, 0)),
            pl.BlockSpec((1, 1, three_h), lambda di, li: (di, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((length, d, b, three_h), gates.dtype),
            jax.ShapeDtypeStruct((d, h, three_h), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, three_h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(gates, ys, dys, wt_c)
    return dxp, dw, db[:, 0, :]


def _gru_sequence_fwd(xp, w_hh, b_hh, interpret):
    ys, gates = _forward(xp, w_hh, b_hh, interpret, with_gates=True)
    return ys, (gates, w_hh, b_hh, ys)


def _gru_sequence_bwd(interpret, res, dys):
    gates, w_hh, b_hh, ys = res
    dxp, dw, db = _backward(gates, w_hh, ys, dys, interpret)
    return dxp, dw.astype(w_hh.dtype), db.astype(b_hh.dtype)


gru_sequence.defvjp(_gru_sequence_fwd, _gru_sequence_bwd)
