"""Greedy CTC decoding as a vectorized on-device op.

The reference decodes per-trial on host: ``argmax`` over the valid frames,
``torch.unique_consecutive``, then drop blanks (``neural_decoder_trainer.py:
313-320``).  Here the whole batch decodes in one jitted pass with static
shapes: collapse-repeats and blank-removal become masked compactions, so
eval does not bounce per-trial tensors between host and TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def greedy_decode(
    log_probs: jax.Array, input_lens: jax.Array, *, blank_id: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Batched greedy CTC decode.

    Args:
      log_probs: ``[B, T, K]`` (any monotone score — argmax only).
      input_lens: ``[B]`` valid frame counts.

    Returns:
      ``(tokens [B, T], lens [B])`` — decoded label IDs, left-packed and
      zero-padded; semantics identical to the reference's
      argmax → unique_consecutive → remove-blank pipeline.
    """
    b, t, _ = log_probs.shape
    ids = jnp.argmax(log_probs, axis=-1)  # [B, T]
    valid = jnp.arange(t)[None, :] < input_lens[:, None]
    prev = jnp.concatenate([jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    keep = valid & (ids != prev) & (ids != blank_id)
    # Left-pack kept tokens: position = cumsum(keep) - 1.
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    out_lens = jnp.sum(keep.astype(jnp.int32), axis=1)
    tokens = jnp.zeros((b, t), dtype=ids.dtype)
    scatter_pos = jnp.where(keep, pos, t - 1)  # dump discards into last slot
    tokens = jax.vmap(lambda tk, sp, i, k: tk.at[sp].set(jnp.where(k, i, tk[sp])))(
        tokens, scatter_pos, ids, keep
    )
    # Zero out anything at/after out_len (covers the dump slot).
    tokens = jnp.where(jnp.arange(t)[None, :] < out_lens[:, None], tokens, 0)
    return tokens, out_lens


def edit_distance(a, b) -> int:
    """Levenshtein distance (host-side) over any element sequences
    comparable with ``!=`` (int arrays, byte views, word-string lists),
    replacing the ``edit_distance`` package's
    ``SequenceMatcher.distance()`` used at
    ``neural_decoder_trainer.py:326-330``."""
    a = list(a)
    b = list(b)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


def batch_per(
    decoded: np.ndarray,
    decoded_lens: np.ndarray,
    targets: np.ndarray,
    target_lens: np.ndarray,
) -> tuple[int, int]:
    """Summed edit distance and summed target length over a batch.

    PER (the reference's ``eval/cer``) = Σ distance / Σ target length
    (``neural_decoder_trainer.py:332-333``).
    """
    total_dist = 0
    total_len = 0
    for i in range(len(decoded_lens)):
        hyp = decoded[i, : decoded_lens[i]]
        ref = targets[i, : target_lens[i]]
        total_dist += edit_distance(ref, hyp)
        total_len += int(target_lens[i])
    return total_dist, total_len
