"""Ablation profiler for the Conformer (transformer_ctc) train step.

Times the full reference-config train step (``scripts/train_conformer.py:7-8``
config: 8 layers, latent 1024, ff 2048, B=64) on the attached TPU, then
re-times it with individual features ablated to attribute the step budget:
dropout off, SpecAugment off, attention off, conv module off, FF halved.

Timing notes (axon tunnel): block via a host transfer, never
block_until_ready.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def make_args(**over):
    args = {
        "model_type": "transformer_ctc",
        "nInputFeatures": 256,
        "nClasses": 40,
        "gaussianSmoothWidth": 2.0,
        "whiteNoiseSD": 1.0,
        "constantOffsetSD": 0.2,
        "lrStart": 1e-3,
        "lrEnd": 1e-3,
        "l2_decay": 1e-5,
        "nBatch": 15000,
        "seed": 0,
        "compute_dtype": "bfloat16",
        "watch_log_freq": 0,
        "label_smoothing": 0.1,
        "optimizer": "adamw",
    }
    args.update(over)
    return args


def time_step(args, b=64, t=1280, u=64, n_steps=10):
    from neural_speech_decoder_tpu.training.optim import make_optimizer
    from neural_speech_decoder_tpu.training.trainer import (
        build_model,
        make_train_step,
    )

    model = build_model(args, n_days=24)
    params = model.init(jax.random.key(0))
    tx, _ = make_optimizer(args)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.array(0),
    }
    train_step = make_train_step(args, model, tx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, 256)), dtype=jnp.float32)
    y = jnp.asarray(rng.integers(1, 41, size=(b, u)), dtype=jnp.int32)
    x_lens = jnp.asarray(rng.integers(400, t + 1, size=(b,)), dtype=jnp.int32)
    y_lens = jnp.asarray(rng.integers(20, u + 1, size=(b,)), dtype=jnp.int32)
    days = jnp.asarray(rng.integers(0, 24, size=(b,)), dtype=jnp.int32)
    key = jax.random.key(0, impl="rbg")

    for _ in range(3):
        state, metrics = train_step(state, x, y, x_lens, y_lens, days, key)
        float(metrics["train/loss"])
    start = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = train_step(state, x, y, x_lens, y_lens, days, key)
    float(metrics["train/loss"])
    dt = (time.perf_counter() - start) / n_steps
    return dt, b / dt


def main():
    variants = [
        ("baseline bf16 B=64", make_args(), dict(b=64)),
        ("no dropout", make_args(transformer_dropout=0.0, drop_path_prob=0.0),
         dict(b=64)),
        ("no specaugment", make_args(use_spec_augment=False), dict(b=64)),
        ("4 layers", make_args(transformer_num_layers=4), dict(b=64)),
        ("heads=1 (attn softmax cost probe)",
         make_args(transformer_n_heads=1), dict(b=64)),
        ("no label smoothing", make_args(label_smoothing=0.0), dict(b=64)),
        ("B=128", make_args(), dict(b=128)),
        ("conv k=3 (dw conv cost probe)",
         make_args(conformer_conv_kernel=3), dict(b=64)),
        ("ff=512 (FF cost probe)",
         make_args(transformer_dim_ff=512), dict(b=64)),
        ("naive attention", make_args(fused_attention=False), dict(b=64)),
        ("no droppath", make_args(drop_path_prob=0.0), dict(b=64)),
    ]
    sel = sys.argv[1:] or None
    for name, args, kw in variants:
        if sel and not any(s in name for s in sel):
            continue
        try:
            dt, sps = time_step(args, **kw)
            print(f"{name:44s} {dt * 1e3:8.1f} ms/step  {sps:7.1f} seq/s",
                  flush=True)
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
