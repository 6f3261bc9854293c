"""Pallas TPU CTC loss: forward-backward recursions as on-chip kernels.

``optax.ctc_loss`` runs the alpha recursion as a ``lax.scan`` whose per-step
work ([B, 2U+1] log-adds) is far below TPU loop overhead — ~14 ms per train
step at reference scale (T=313) for ~0.1 ms of arithmetic. Here the alpha
and beta recursions run inside Pallas kernels: the state row stays in a
VMEM scratch, per-step label-indexed log-probs stream through the pipeline,
and the whole loss+grad costs ~1-2 ms.

Structure:
  * XLA precomputes ``lpz[t, b, s] = log_softmax(u)[b, t, z_s]`` — the
    extended-label gather (blank, y1, blank, ..., blank; invalid s lanes
    baked to -inf) — plus the skip-transition mask;
  * the alpha kernel scans t forward, the beta kernel scans t backward,
    each one grid step per frame, carrying [B, S] in VMEM and handling
    per-sample lengths by freezing (alpha) / lazily initializing (beta)
    rows outside their valid range;
  * loss and the gradient (softmax(u) - gamma, gamma scattered back from
    extended labels via a tiny one-hot einsum) assemble in XLA;
  * a custom VJP exposes it as ``ctc_loss_tpu(log_probs_or_logits, ...)``
    with per-sequence losses, matching ``optax.ctc_loss`` numerics (tested).

Reference semantics anchored: blank id 0, label convention from the
formatter (+1 IDs), same per-seq NLL the trainer's reductions consume.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _logsum3(a, b, c):
    mx = jnp.maximum(jnp.maximum(a, b), c)
    mx_safe = jnp.maximum(mx, NEG_INF / 2)
    out = mx + jnp.log(
        jnp.exp(a - mx_safe) + jnp.exp(b - mx_safe) + jnp.exp(c - mx_safe)
    )
    return jnp.where(mx <= NEG_INF, NEG_INF, out)


def _shift_right(x, n):
    """Shift lanes right by n along the last dim, filling -inf."""
    pad = jnp.full(x.shape[:-1] + (n,), NEG_INF, x.dtype)
    return jnp.concatenate([pad, x[..., :-n]], axis=-1)


def _shift_left(x, n):
    pad = jnp.full(x.shape[:-1] + (n,), NEG_INF, x.dtype)
    return jnp.concatenate([x[..., n:], pad], axis=-1)


def _alpha_kernel(lpz_ref, skip_ref, lens_ref, alpha_ref, a_ref):
    t = pl.program_id(0)
    lpz_t = lpz_ref[0]  # [B, S]

    @pl.when(t == 0)
    def _():
        s_idx = jax.lax.broadcasted_iota(jnp.int32, lpz_t.shape, 1)
        a_ref[:] = jnp.where(s_idx <= 1, lpz_t, NEG_INF)

    @pl.when(t > 0)
    def _():
        a = a_ref[:]
        new = _logsum3(
            a, _shift_right(a, 1), _shift_right(a, 2) + skip_ref[:]
        ) + lpz_t
        frozen = t >= lens_ref[:]  # [B, 1] broadcast: past-end rows freeze
        a_ref[:] = jnp.where(frozen, a, new)

    alpha_ref[0] = a_ref[:]


def _beta_kernel(lpz_next_ref, skip_ref, lens_ref, send_ref, beta_ref, b_ref):
    """Reverse walk; program l corresponds to t = T-1-l. Carries beta_t."""
    l = pl.program_id(0)
    n_l = pl.num_programs(0)
    t = n_l - 1 - l

    @pl.when(l == 0)
    def _():
        b_ref[:] = jnp.full_like(b_ref, NEG_INF)

    b = b_ref[:]
    # Recursion uses t+1 quantities (lpz_next_ref is index-mapped to t+1,
    # clamped at the last frame where it is unused for t = T-1).
    term = b + lpz_next_ref[0]
    new = _logsum3(
        term,
        _shift_left(term, 1),
        _shift_left(term + skip_ref[:], 2),
    )
    # skip mask indexes the DESTINATION state: transition s -> s+2 allowed
    # iff skip[s+2]; term+skip then shift-left-2 aligns skip_{s+2} with s.
    at_init = t == (lens_ref[:] - 1)  # [B, 1] broadcast
    past = t >= lens_ref[:]
    b_new = jnp.where(at_init, send_ref[:], jnp.where(past, b, new))
    b_ref[:] = b_new
    beta_ref[0] = b_new


def _run_alpha(lpz, skip_add, lens, interpret):
    t_max, b, s = lpz.shape
    return pl.pallas_call(
        _alpha_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, b, s), lambda t: (t, 0, 0)),
            pl.BlockSpec((b, s), lambda t: (0, 0)),
            pl.BlockSpec((b, 1), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, s), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(lpz, skip_add, lens)


def _run_beta(lpz, skip_add, lens, s_end, interpret):
    t_max, b, s = lpz.shape
    rev_next = lambda t: (jnp.minimum(t_max - 1 - t + 1, t_max - 1), 0, 0)
    return pl.pallas_call(
        _beta_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, b, s), rev_next),
            pl.BlockSpec((b, s), lambda t: (0, 0)),
            pl.BlockSpec((b, 1), lambda t: (0, 0)),
            pl.BlockSpec((b, s), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, s), lambda t: (t_max - 1 - t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(lpz, skip_add, lens, s_end)


def _prepare(log_probs, labels, label_lens, input_lens):
    """Extended-label arrays: lpz [T,B,S], skip_add [B,S], end-state init."""
    b, t_max, k = log_probs.shape
    u = labels.shape[1]
    s_real = 2 * u + 1
    s_pad = _round_up(s_real, 128)

    lp = jax.nn.log_softmax(log_probs.astype(jnp.float32), axis=-1)
    z = jnp.zeros((b, s_pad), jnp.int32)
    z = z.at[:, 1 : s_real : 2].set(labels.astype(jnp.int32))
    s_idx = jnp.arange(s_pad)[None, :]
    valid = s_idx < (2 * label_lens[:, None] + 1)

    # Label-indexed log-probs via one-hot matmul: an explicit gather of
    # [B,T,S] elements lowers to slow scalar gathers on TPU, while K=41
    # makes this a near-free MXU contraction.
    onehot_z = jax.nn.one_hot(z, k, dtype=jnp.float32)  # [B, S, K]
    lpz = jnp.einsum(
        "btk,bsk->bts", lp, onehot_z, preferred_element_type=jnp.float32
    )
    lpz = jnp.where(valid[:, None, :], lpz, NEG_INF)
    lpz = lpz.transpose(1, 0, 2)  # [T, B, S]

    # skip transition into state s allowed iff z_s != blank and z_s != z_{s-2}
    z_m2 = jnp.pad(z, ((0, 0), (2, 0)))[:, :s_pad]
    skip_ok = (z != 0) & (z != z_m2) & (s_idx >= 2)
    skip_add = jnp.where(skip_ok & valid, 0.0, NEG_INF).astype(jnp.float32)

    # beta end-state init: 0 at s in {2u, 2u-1}, else -inf
    end_hi = 2 * label_lens[:, None]
    send = jnp.where(
        (s_idx == end_hi) | (s_idx == jnp.maximum(end_hi - 1, 0)), 0.0, NEG_INF
    ).astype(jnp.float32)
    lens2d = input_lens.astype(jnp.int32)[:, None]
    return lp, lpz, z, skip_add, send, lens2d, s_pad


def _loss_from_alpha(alpha, input_lens, label_lens):
    b = alpha.shape[1]
    t_idx = jnp.clip(input_lens.astype(jnp.int32) - 1, 0, alpha.shape[0] - 1)
    last = alpha[t_idx, jnp.arange(b)]  # [B, S]
    hi = 2 * label_lens.astype(jnp.int32)
    lo = jnp.maximum(hi - 1, 0)
    a_hi = jnp.take_along_axis(last, hi[:, None], axis=1)[:, 0]
    a_lo = jnp.take_along_axis(last, lo[:, None], axis=1)[:, 0]
    # Empty target: only one final state exists (hi == lo == 0); summing it
    # twice would understate the NLL by log 2.
    a_lo = jnp.where(hi == 0, NEG_INF, a_lo)
    mx = jnp.maximum(a_hi, a_lo)
    mx_safe = jnp.maximum(mx, NEG_INF / 2)
    logp = mx + jnp.log(jnp.exp(a_hi - mx_safe) + jnp.exp(a_lo - mx_safe))
    return -jnp.where(mx <= NEG_INF, NEG_INF, logp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_tpu(log_probs, input_lens, labels, label_lens, interpret=False):
    """Per-sequence CTC NLL, blank id 0, matching optax.ctc_loss numerics.

    ``log_probs`` may be logits or log-probs (log_softmax idempotent).
    """
    loss, _ = _forward(log_probs, input_lens, labels, label_lens, interpret)
    return loss


def _forward(log_probs, input_lens, labels, label_lens, interpret):
    lp, lpz, z, skip_add, send, lens2d, _ = _prepare(
        log_probs, labels, label_lens, input_lens
    )
    alpha = _run_alpha(lpz, skip_add, lens2d, interpret)
    loss = _loss_from_alpha(alpha, input_lens, label_lens)
    return loss, (lp, lpz, z, skip_add, send, lens2d, alpha)


def _ctc_fwd(log_probs, input_lens, labels, label_lens, interpret):
    loss, res = _forward(log_probs, input_lens, labels, label_lens, interpret)
    # dtype witness: residuals must be jax types, not dtype objects
    witness = jnp.zeros((0,), log_probs.dtype)
    return loss, (res, input_lens, labels, label_lens, witness)


def _ctc_bwd(interpret, carry, g):
    res, input_lens, labels, label_lens, witness = carry
    in_dtype = witness.dtype
    lp, lpz, z, skip_add, send, lens2d, alpha = res
    t_max, b, s_pad = lpz.shape
    beta = _run_beta(lpz, skip_add, lens2d, send, interpret)
    loss = _loss_from_alpha(alpha, input_lens, label_lens)
    log_gamma = alpha + beta + loss[None, :, None]  # -(-logP)
    gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
    t_valid = (
        jnp.arange(t_max)[:, None] < input_lens.astype(jnp.int32)[None, :]
    )
    gamma = jnp.where(t_valid[:, :, None], gamma, 0.0)
    # scatter extended states back to classes: one-hot over K (41) is tiny
    k = lp.shape[-1]
    onehot = jax.nn.one_hot(z, k, dtype=jnp.float32)  # [B, S, K]
    gamma_k = jnp.einsum(
        "tbs,bsk->btk", gamma, onehot, preferred_element_type=jnp.float32
    )
    du = jnp.exp(lp) * t_valid.T[:, :, None] - gamma_k
    du = du * g[:, None, None]
    return du.astype(in_dtype), None, None, None


ctc_loss_tpu.defvjp(_ctc_fwd, _ctc_bwd)
