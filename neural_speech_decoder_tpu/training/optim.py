"""Optimizers and LR schedules matching the reference's two configurations.

GRU path (``neural_decoder_trainer.py:163-175``):
  torch.optim.Adam(lr=lrStart, betas=(0.9, 0.999), eps=0.1,
                   weight_decay=l2_decay)          # L2 folded into gradients
  + LinearLR(start_factor=1.0, end_factor=lrEnd/lrStart, total_iters=nBatch)

Conformer path (``:144-161``):
  torch.optim.AdamW(lr=lrStart, eps=1e-6, weight_decay=...)  # decoupled
  + LambdaLR: linear warmup over ``warmup_steps`` then cosine to 0.

torch-semantics notes encoded here:
  * torch Adam's eps is added *outside* the sqrt — optax ``scale_by_adam``
    with ``eps_root=0`` matches.
  * torch Adam ``weight_decay`` is L2 (added to the gradient before moment
    updates) — ``optax.add_decayed_weights`` *before* ``scale_by_adam``.
  * torch AdamW is decoupled and lr-scaled — ``optax.adamw`` matches.
  * schedulers step after the optimizer, so update ``i`` (0-based) uses the
    schedule evaluated at ``i`` — same indexing as optax schedule counts.
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def linear_lr_schedule(
    lr_start: float, lr_end: float, total_iters: int
) -> Callable[[int], float]:
    """torch LinearLR semantics with start_factor=1.0."""
    end_factor = lr_end / lr_start if lr_start != 0 else 1.0

    def schedule(count):
        import jax.numpy as jnp

        frac = jnp.minimum(count, total_iters) / max(total_iters, 1)
        return lr_start * (1.0 + (end_factor - 1.0) * frac)

    return schedule


def warmup_cosine_schedule(
    lr_start: float, warmup_steps: int, total_steps: int
) -> Callable[[int], float]:
    """Reference ``lr_lambda`` (neural_decoder_trainer.py:155-159)."""

    def schedule(count):
        import jax.numpy as jnp

        warm = (count + 1.0) / max(1, warmup_steps)
        progress = (count - warmup_steps) / max(1, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        if warmup_steps > 0:
            lam = jnp.where(count < warmup_steps, warm, cos)
        else:
            lam = cos
        return lr_start * lam

    return schedule


def make_optimizer(args: dict) -> tuple[optax.GradientTransformation, Callable]:
    """Build (transform, schedule) from a reference-style args dict."""
    n_batch = int(args["nBatch"])
    lr_start = float(args["lrStart"])
    # Reference clips grads (max_norm 1.0) iff the model is the Conformer
    # (neural_decoder_trainer.py:255-257), independent of the optimizer.
    clip = args.get("model_type", "gru_baseline") == "transformer_ctc"
    pre = [optax.clip_by_global_norm(1.0)] if clip else []
    if args.get("optimizer", "adam") == "adamw":
        schedule = warmup_cosine_schedule(
            lr_start, int(args.get("warmup_steps", 0)), n_batch
        )
        wd = float(args.get("weight_decay", args.get("l2_decay", 0)))
        tx = optax.chain(
            *pre,
            optax.adamw(
                learning_rate=schedule,
                b1=0.9,
                b2=0.999,
                eps=1e-6,
                weight_decay=wd,
            ),
        )
    else:
        schedule = linear_lr_schedule(
            lr_start, float(args.get("lrEnd", lr_start)), n_batch
        )
        l2 = float(args.get("l2_decay", 0))
        steps = list(pre)
        if l2 > 0:
            steps.append(optax.add_decayed_weights(l2))
        steps += [
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=0.1, eps_root=0.0),
            optax.scale_by_learning_rate(schedule),
        ]
        tx = optax.chain(*steps)
    return tx, schedule
