"""CTC loss with reference-compatible semantics.

The reference uses ``torch.nn.CTCLoss(blank=0, zero_infinity=True)`` with
either ``reduction="mean"`` (GRU path) or ``reduction="none"`` followed by
mean/sum at the call site (Conformer + label smoothing path)
(``neural_decoder_trainer.py:133-141,213-248``).

We build on ``optax.ctc_loss`` (a lax.scan forward algorithm that runs fully
on-device) and add:
  * ``zero_infinity`` semantics — torch zeroes the loss (and grads) of
    infeasible alignments (label too long for the input length). optax
    instead returns a huge finite value via ``log_epsilon``; we mask by the
    exact CTC feasibility condition ``T >= U + n_repeats``.
  * torch-style reductions: "mean" divides each sequence loss by its target
    length before averaging over the batch; "sum" and "none" as in torch.

Inputs are padded to static shapes (TPU requirement); padding is conveyed by
lengths, converted to the padding indicators optax expects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _length_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def ctc_feasible(
    labels: jax.Array, label_lens: jax.Array, input_lens: jax.Array
) -> jax.Array:
    """True where a CTC alignment exists: T >= U + #(consecutive repeats)."""
    u = labels.shape[1]
    valid = _length_mask(label_lens, u)
    rep = (labels[:, 1:] == labels[:, :-1]) & valid[:, 1:] & valid[:, :-1]
    n_rep = jnp.sum(rep.astype(jnp.int32), axis=1)
    return input_lens >= label_lens + n_rep


def _ctc_kernel_sharded(log_probs, input_lens, labels, label_lens):
    """Per-sequence Pallas CTC loss on the shared batch-sharded kernel
    path (``parallel.kernel_mesh.batch_shard_mapped``): every operand is
    mapped over the batch axis — each device computes the alpha/beta
    recursions for its local shard, and the transpose needs no psum since
    all differentiable inputs are batch-mapped. ``tile=8`` enforces the
    kernel's per-SHARD batch requirement even on forced ``use_kernel=True``
    runs. Returns None on a multi-device run whose mesh can't map the
    batch — the caller falls back to the optax path, which shards cleanly
    under GSPMD; a bare replicated kernel would be strictly worse. Off-TPU
    backends use the Pallas interpreter (tests)."""
    from functools import partial

    from .pallas.ctc_kernel import ctc_loss_tpu
    from ..parallel.kernel_mesh import batch_shard_mapped

    fn = partial(ctc_loss_tpu, interpret=jax.default_backend() != "tpu")
    return batch_shard_mapped(
        fn, log_probs, input_lens, labels, label_lens,
        batch_dims=(0, 0, 0, 0),
        out_batch_dims=0,
        tile=8,
    )


def ctc_loss(
    log_probs: jax.Array,
    input_lens: jax.Array,
    labels: jax.Array,
    label_lens: jax.Array,
    *,
    blank_id: int = 0,
    reduction: str = "mean",
    zero_infinity: bool = True,
    use_kernel: bool | None = None,
) -> jax.Array:
    """CTC negative log-likelihood.

    Args:
      log_probs: ``[B, T, K]`` log-probabilities (or logits — log_softmax is
        idempotent so both are accepted, mirroring how the reference feeds
        log-softmaxed values into a loss that tolerates them).
      input_lens: ``[B]`` valid frames per sequence.
      labels: ``[B, U]`` int labels, 0 = blank/pad (notebook cell 3's +1
        offset convention).
      label_lens: ``[B]`` valid label counts.
      reduction: "mean" | "sum" | "none" with torch semantics ("mean"
        divides per-sequence loss by target length, then batch-averages).
      use_kernel: None = auto (Pallas kernel on TPU for tile-aligned
        shapes; multi-device additionally needs a registered kernel mesh —
        parallel/kernel_mesh.py — to shard_map the kernel over the batch
        axis, else the optax path shards cleanly under GSPMD); True =
        force the kernel (interpreter mode off-TPU, for tests); False =
        always optax.

    Returns: scalar for "mean"/"sum", ``[B]`` for "none".
    """
    t = log_probs.shape[1]
    u = labels.shape[1]
    kernel_safe = (
        blank_id == 0
        and zero_infinity  # the kernel returns a 1e30 sentinel (and a
        # garbage gradient) for infeasible rows; only the zero_infinity
        # masking below makes that safe
    )
    if use_kernel is None:
        from ..parallel.kernel_mesh import kernel_batch_shards

        use_tpu_kernel = (
            kernel_safe
            and jax.default_backend() == "tpu"
            and log_probs.shape[0] % 8 == 0
            and kernel_batch_shards(log_probs.shape[0], tile=8) is not None
        )
    else:
        use_tpu_kernel = use_kernel and kernel_safe
        if (
            use_tpu_kernel
            and jax.default_backend() == "tpu"
            and log_probs.shape[0] % 8 != 0
        ):
            import warnings

            warnings.warn(
                f"use_kernel=True forces the Pallas CTC kernel with batch "
                f"{log_probs.shape[0]} not a multiple of 8 — this will "
                f"fail Mosaic lowering on TPU (the auto-gate would have "
                f"used the optax path).",
                stacklevel=2,
            )
    if use_tpu_kernel:
        # Pallas forward-backward kernels: optax's lax.scan pays ~20us of
        # loop overhead per frame for ~0.1us of math (see ops/pallas/
        # ctc_kernel.py); numerics parity is pinned by test_pallas_ctc.
        # None = unmappable multi-device mesh → optax fallback below.
        per_seq = _ctc_kernel_sharded(
            log_probs, input_lens, labels, label_lens
        )
        if per_seq is None:
            use_tpu_kernel = False
    if not use_tpu_kernel:
        logit_pad = 1.0 - _length_mask(input_lens, t).astype(log_probs.dtype)
        label_pad = 1.0 - _length_mask(label_lens, u).astype(log_probs.dtype)
        per_seq = optax.ctc_loss(
            log_probs, logit_pad, labels, label_pad, blank_id=blank_id
        )
    if zero_infinity:
        ok = ctc_feasible(labels, label_lens, input_lens)
        per_seq = jnp.where(ok, per_seq, 0.0)
    if reduction == "none":
        return per_seq
    if reduction == "sum":
        return jnp.sum(per_seq)
    if reduction == "mean":
        denom = jnp.maximum(label_lens, 1).astype(per_seq.dtype)
        return jnp.mean(per_seq / denom)
    raise ValueError(f"unknown reduction: {reduction}")
