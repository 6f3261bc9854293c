"""On-device batched CTC prefix beam search (no LM), fully jittable.

The competition pipeline decodes on host through the native lexicon+LM
engine; for the no-LM path (live decoding, eval-time n-best, streaming)
this implementation keeps the whole search on the TPU: static shapes,
``lax.scan`` over time, ``vmap`` over the batch, top-k pruning per frame.

Semantics: standard prefix beam search (Hannun et al.), EXACT up to the
pruning width: per step, extensions that recreate an existing beam's prefix
fold their mass into that beam's stay candidate (a vectorized content
comparison — beam uniqueness then holds by induction), so at matched beam
capacity the results equal the host oracle's bit-for-bit (tested). Blank
id 0, matching the framework label convention.

Two surfaces:
  * ``prefix_beam_search(log_probs, input_lens)`` — offline, whole
    utterances in one call;
  * ``beam_init`` / ``beam_extend`` / ``beam_finalize`` — carried-state
    chunked decoding for streaming: feed frames as they are emitted; the
    carried ``BeamState`` makes the result exactly chunk-boundary-
    invariant (``beam_extend(beam_extend(s, a), b) ==
    beam_extend(s, concat(a, b))`` — the scan carry is the same).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class BeamState(NamedTuple):
    """Carried beam-search state. Leaves lead with [B, W, ...]."""

    prefixes: jax.Array  # [B, W, L_cap] int32, zero-padded
    lens: jax.Array  # [B, W] int32
    last: jax.Array  # [B, W] int32, -1 = empty prefix
    p_b: jax.Array  # [B, W] f32 log-mass ending in blank
    p_nb: jax.Array  # [B, W] f32 log-mass ending in non-blank


def _logsum(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    safe = jnp.where(mx <= NEG_INF, NEG_INF, mx + jnp.log1p(jnp.exp(mn - mx)))
    return jnp.where(mn <= NEG_INF, mx, safe)


def _beam_step(state, frame, top_k_tokens: int, blank_id: int):
    """One frame's update of a single stream's beam state.

    ``state``: (prefixes [W, L], lens, last, p_b, p_nb); ``frame``: [K].
    """
    prefixes, lens, last, p_b, p_nb = state
    w, l_cap = prefixes.shape
    tot = _logsum(p_b, p_nb)

    top_lp, top_ids = jax.lax.top_k(frame, top_k_tokens)

    # --- stay candidates (same prefix) -------------------------
    stay_pb = tot + frame[blank_id]
    rep_lp = jnp.where(last >= 0, frame[jnp.maximum(last, 0)], NEG_INF)
    stay_pnb = p_nb + rep_lp

    # --- extension candidates [W, K'] --------------------------
    is_rep = top_ids[None, :] == last[:, None]  # [W, K']
    src = jnp.where(is_rep, p_b[:, None], tot[:, None])
    ext_valid = top_ids[None, :] != blank_id
    ext_pnb = jnp.where(ext_valid, src + top_lp[None, :], NEG_INF)

    # --- merge extensions that recreate an existing beam --------
    # An extension (i, c) whose prefix equals beam j's prefix must
    # fold its mass into j's stay candidate; keeping it separate
    # splits probability across duplicate beams (beam uniqueness
    # then holds by induction). pm[i, j]: prefix_j == prefix_i + 1
    # token, content-equal over the first lens_i positions.
    eq = prefixes[:, None, :] == prefixes[None, :, :]  # [W, W, L]
    pos_ignored = (
        jnp.arange(l_cap)[None, None, :] >= lens[:, None, None]
    )
    pm = jnp.all(eq | pos_ignored, axis=-1) & (
        lens[None, :] == lens[:, None] + 1
    )
    # match[i, kk, j]
    match = (
        pm[:, None, :]
        & (top_ids[None, :, None] == last[None, None, :])
        & ext_valid[:, :, None]
    )
    contrib = jnp.where(match, ext_pnb[:, :, None], NEG_INF)
    mx = jnp.max(contrib, axis=(0, 1))
    merged = jnp.where(
        mx <= NEG_INF,
        NEG_INF,
        mx
        + jnp.log(
            jnp.sum(
                jnp.where(match, jnp.exp(contrib - mx), 0.0),
                axis=(0, 1),
            )
            + 1e-37
        ),
    )
    stay_pnb = _logsum(stay_pnb, merged)
    ext_pnb = jnp.where(jnp.any(match, axis=-1), NEG_INF, ext_pnb)

    # --- select top W among W stay + W*K' extensions ------------
    stay_tot = _logsum(stay_pb, stay_pnb)
    cand_scores = jnp.concatenate(
        [stay_tot, ext_pnb.reshape(-1)]
    )  # [W + W*K']
    sel_scores, sel_idx = jax.lax.top_k(cand_scores, w)

    is_stay = sel_idx < w
    parent = jnp.where(is_stay, sel_idx, (sel_idx - w) // top_k_tokens)
    tok_pos = jnp.where(is_stay, 0, (sel_idx - w) % top_k_tokens)
    token = top_ids[tok_pos]

    new_prefixes = prefixes[parent]
    new_lens = lens[parent]
    new_last = last[parent]
    # write extension token at position len (only for extend picks)
    wrote = new_prefixes.at[
        jnp.arange(w), jnp.minimum(new_lens, l_cap - 1)
    ].set(token)
    # At prefix capacity (len == max_len) the buffer cannot represent a
    # longer sequence: keep the stored prefix unchanged and clamp the
    # length, so returned lens never exceed max_len and the last slot
    # does not churn (over-cap beams carry a truncated tail).
    at_cap = new_lens >= l_cap
    new_prefixes = jnp.where(
        (is_stay | at_cap)[:, None], new_prefixes, wrote
    )
    new_lens = jnp.where(
        is_stay, new_lens, jnp.minimum(new_lens + 1, l_cap)
    )
    new_last = jnp.where(is_stay, new_last, token)
    new_pb = jnp.where(is_stay, stay_pb[parent], NEG_INF)
    new_pnb = jnp.where(is_stay, stay_pnb[parent], sel_scores)

    return (new_prefixes, new_lens, new_last, new_pb, new_pnb)


def beam_init(
    batch: int, beam_width: int, max_len: int, dtype=jnp.float32
) -> BeamState:
    """Fresh beam state: one live beam (the empty prefix) per stream.

    ``max_len`` caps the decodable label-sequence length (the prefix
    buffer is static-shaped); decoded streams longer than that truncate.
    """
    w = beam_width
    return BeamState(
        prefixes=jnp.zeros((batch, w, max_len), jnp.int32),
        lens=jnp.zeros((batch, w), jnp.int32),
        last=jnp.full((batch, w), -1, jnp.int32),
        p_b=jnp.full((batch, w), NEG_INF, dtype).at[:, 0].set(0.0),
        p_nb=jnp.full((batch, w), NEG_INF, dtype),
    )


@partial(jax.jit, static_argnames=("top_k_tokens", "blank_id"), donate_argnums=0)
def beam_extend(
    state: BeamState,
    log_probs: jax.Array,
    *,
    top_k_tokens: int = 8,
    blank_id: int = 0,
) -> BeamState:
    """Advance every stream's beam state by a chunk of frames.

    ``log_probs``: [B, T_chunk, K] per-frame log-probs (every frame is
    consumed — mask/slice invalid frames on the caller side). The state is
    donated: steady-state streaming reuses its buffers in place.
    """
    top_k_tokens = min(top_k_tokens, log_probs.shape[-1])

    def one(st, lp):
        return jax.lax.scan(
            lambda s, f: (_beam_step(s, f, top_k_tokens, blank_id), None),
            tuple(st), lp,
        )[0]

    return BeamState(*jax.vmap(one)(state, log_probs))


@jax.jit
def beam_finalize(state: BeamState):
    """Sort beams best-first; returns (prefixes [B,W,L], lens, scores)."""

    def one(st):
        prefixes, lens, _, p_b, p_nb = st
        scores = _logsum(p_b, p_nb)
        order = jnp.argsort(-scores)
        return prefixes[order], lens[order], scores[order]

    return jax.vmap(one)(state)


@partial(
    jax.jit,
    static_argnames=("beam_width", "top_k_tokens", "blank_id"),
)
def prefix_beam_search(
    log_probs: jax.Array,
    input_lens: jax.Array,
    *,
    beam_width: int = 8,
    top_k_tokens: int = 8,
    blank_id: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched prefix beam search (offline surface).

    Args:
      log_probs: ``[B, T, K]`` per-frame log-probs.
      input_lens: ``[B]`` valid frame counts.

    Returns:
      ``(prefixes [B, W, T], lens [B, W], scores [B, W])`` — n-best label
      sequences (zero-padded), sorted best-first per batch row.
    """
    b, t_max, k = log_probs.shape
    top_k_tokens = min(top_k_tokens, k)
    init = beam_init(b, beam_width, t_max)

    def decode_one(st, lp, t_valid):
        def step(state, inp):
            frame, t = inp
            new_state = _beam_step(state, frame, top_k_tokens, blank_id)
            # frames beyond the valid length leave the state untouched
            keep = t < t_valid
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    jnp.reshape(keep, (1,) * n.ndim), n, o
                ),
                new_state,
                state,
            )
            return state, None

        st, _ = jax.lax.scan(step, tuple(st), (lp, jnp.arange(t_max)))
        prefixes, lens, last, p_b, p_nb = st
        scores = _logsum(p_b, p_nb)
        order = jnp.argsort(-scores)
        return prefixes[order], lens[order], scores[order]

    return jax.vmap(decode_one)(init, log_probs, input_lens)
