"""Training-health drive at the FULL reference configuration on the chip.

Runs a few hundred real-config train steps (B=64, 256ch, 5-layer bidir GRU
H=1024, bf16, noise aug, Adam — ``/root/reference/scripts/train_model.py:
4-31``) on structured synthetic data and a full eval pass, verifying that
the production kernel path (Pallas GRU scans, fused frontend, Pallas CTC)
actually *trains*: loss falls monotonically (windowed) and greedy PER
improves from chance.

The axon TPU tunnel's host→device bandwidth (~100-200 MB/s) would dominate
a naive loop (84 MB/batch), so the drive pre-stages a pool of distinct
batches on-device and cycles through them — the compute path per step is
identical to production training.

Usage: python scripts/drive_real_config.py [--steps 300] [--pool 12]
                                           [--model gru|conformer]
Prints one JSON line with the loss trajectory + eval PER before/after.
``--model conformer`` runs the reference Conformer recipe instead
(``scripts/train_conformer.py:4-58``: 8 blocks, d=1024, AdamW + warmup,
label smoothing, InterCTC, SpecAugment) on the fused-MHSA kernel path.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--pool", type=int, default=12)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="gru", choices=("gru", "conformer"))
    ap.add_argument("--eval-batches", type=int, default=1_000_000,
                    help="cap eval to N batches (tunnel-friendly drives)")
    ap.add_argument("--causal", action="store_true",
                    help="train the streaming-compatible causal Conformer "
                         "(banded 128-frame-left-context attention + causal "
                         "convs) to quantify the finite-context PER cost")
    ap.add_argument("--buckets", type=int, default=1,
                    help="quantile length buckets (trainer lengthBuckets "
                         "semantics): pool batches pad to per-bucket "
                         "envelopes, one compile per bucket, validating "
                         "bucketed training end-to-end in the real loop")
    ap.add_argument("--tokens-per-batch", type=int, default=0,
                    help="tokens-constant bucketing (trainer tokensPerBatch "
                         "semantics): per-bucket B_k = budget/T_k in "
                         "multiples of 64; requires --buckets > 1")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.data.batching import (
        bucket_batch_sizes,
        choose_envelope,
        length_buckets,
        sample_batch,
    )
    from neural_speech_decoder_tpu.data.dataset import pack_days
    from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
    from neural_speech_decoder_tpu.ops.ctc import ctc_loss
    from neural_speech_decoder_tpu.ops.decode import batch_per, greedy_decode
    from neural_speech_decoder_tpu.training.optim import make_optimizer
    from neural_speech_decoder_tpu.training.trainer import (
        build_model,
        make_eval_step,
        make_train_step,
    )

    if args_cli.model == "gru":
        args = {
            "model_type": "gru_baseline",
            "nInputFeatures": 256,
            "nClasses": 40,
            "nUnits": 1024,
            "nLayers": 5,
            "dropout": 0.4,
            "strideLen": 4,
            "kernelLen": 32,
            "gaussianSmoothWidth": 2.0,
            "bidirectional": True,
            "whiteNoiseSD": 0.2,
            "constantOffsetSD": 0.05,
            "lrStart": 0.02,
            "lrEnd": 0.02,
            "l2_decay": 1e-5,
            "nBatch": 10000,
            "seed": 0,
            "compute_dtype": "bfloat16",
            "watch_log_freq": 0,
        }
    else:
        # Reference Conformer recipe (scripts/train_conformer.py:4-58) with
        # gentler noise for the structured synthetic signal.
        args = {
            "model_type": "transformer_ctc",
            "nInputFeatures": 256,
            "nClasses": 40,
            "temporal_kernel": 32,
            "temporal_stride": 4,
            "gaussian_smooth_width": 2.0,
            "whiteNoiseSD": 0.2,
            "constantOffsetSD": 0.05,
            "frontend_dim": 1024,
            "latent_dim": 1024,
            "autoencoder_hidden_dim": 512,
            "transformer_num_layers": 8,
            "transformer_n_heads": 8,
            "transformer_dim_ff": 2048,
            "transformer_dropout": 0.3,
            "conformer_conv_kernel": 31,
            "drop_path_prob": 0.1,
            "optimizer": "adamw",
            "lrStart": 0.0004,
            "lrEnd": 0.0001,
            "weight_decay": 1e-3,
            "warmup_steps": 50,
            "label_smoothing": 0.1,
            "use_spec_augment": True,
            "spec_augment_freq_mask": 100,
            "spec_augment_time_mask": 40,
            "interctc_weight": 0.3,
            "nBatch": 15000,
            "seed": 0,
            "compute_dtype": "bfloat16",
            "watch_log_freq": 0,
        }
        if args_cli.causal:
            args.update(causal=True, attn_left_context=128)
    # Structured synthetic data at reference dims: learnable phone-locked
    # signal so the loss trajectory is meaningful, lengths 400-1200.
    raw = synthetic_dataset(
        seed=1, n_days=24, trials_per_day=24, n_channels=256,
        min_t=400, max_t=1200, min_u=8, max_u=24, signal_scale=3.0,
    )
    train_ds, test_ds = pack_days(raw["train"]), pack_days(raw["test"])
    t_max, u_max = choose_envelope(train_ds, test_ds, time_multiple=128)
    print(f"envelope T={t_max} U={u_max}", file=sys.stderr)

    model = build_model(args, n_days=24)
    params = model.init(jax.random.key(0))
    tx, _ = make_optimizer(args)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.array(0)}
    train_step = make_train_step(args, model, tx)
    eval_step = make_eval_step(model)

    buckets = (
        length_buckets(train_ds, args_cli.buckets, t_max, time_multiple=128)
        if args_cli.buckets > 1
        else None
    )
    if buckets:
        print(f"bucket envelopes: {buckets}", file=sys.stderr)
    bucket_sizes = (
        bucket_batch_sizes(buckets, args_cli.tokens_per_batch, t_max,
                           multiple=64)
        if buckets and args_cli.tokens_per_batch > 0
        else None
    )
    if bucket_sizes:
        print(f"tokens-constant batch sizes: {bucket_sizes}",
              file=sys.stderr)

    rng = np.random.default_rng(0)
    pool = []
    for _ in range(args_cli.pool):
        b = sample_batch(train_ds, rng, args_cli.batch, t_max, u_max,
                         buckets=buckets, bucket_sizes=bucket_sizes)
        pool.append(tuple(
            jax.device_put(a)
            for a in (b.x, b.y, b.x_lens, b.y_lens, b.days)
        ))
    pool_ts = sorted({int(p[0].shape[1]) for p in pool})
    print(f"staged {len(pool)} batches on device (T envelopes: {pool_ts})",
          file=sys.stderr)

    def run_eval():
        from neural_speech_decoder_tpu.data.batching import eval_batches

        dist = tot = 0
        n_done = 0
        for b in eval_batches(test_ds, args_cli.batch, t_max, u_max):
            if n_done >= args_cli.eval_batches:
                break
            n_done += 1
            arrays = tuple(jax.device_put(a)
                           for a in (b.x, b.y, b.x_lens, b.y_lens, b.days))
            per_seq, tokens, dec_lens = eval_step(state["params"], *arrays)
            real = b.weight > 0
            d, l = batch_per(np.asarray(tokens)[real],
                             np.asarray(dec_lens)[real],
                             b.y[real], b.y_lens[real])
            dist += d
            tot += l
        return dist / max(tot, 1)

    base_key = jax.random.key(0, impl="rbg")
    print("compiling + running pre-train eval...", file=sys.stderr,
          flush=True)
    per_before = float(run_eval())
    print(f"PER before: {per_before:.4f}", file=sys.stderr, flush=True)

    # One real train step per distinct envelope first, so per-bucket
    # compiles don't pollute the throughput window (they are still
    # genuine training steps — state advances).
    warm_envs = {}
    n_warm = 0
    for i, batch in enumerate(pool):
        t_env = int(batch[0].shape[1])
        if t_env in warm_envs:
            continue
        key = jax.random.fold_in(base_key, 10_000_000 + i)
        t0 = time.perf_counter()
        state, metrics = train_step(state, *batch, key)
        float(metrics["train/loss"])  # host block (tunnel-safe)
        warm_envs[t_env] = round(time.perf_counter() - t0, 1)
        n_warm += 1
    print(f"compile warmup (s per envelope): {warm_envs}", file=sys.stderr)

    losses = []
    loss_pool_idx = []
    start = time.perf_counter()
    for step in range(args_cli.steps):
        key = jax.random.fold_in(base_key, step)
        state, metrics = train_step(state, *pool[step % len(pool)], key)
        if step % 20 == 0 or step == args_cli.steps - 1:
            losses.append(round(float(metrics["train/loss"]), 4))
            loss_pool_idx.append(step % len(pool))
            print(f"step {step}: loss {losses[-1]}", file=sys.stderr)
    elapsed = time.perf_counter() - start

    per_after = float(run_eval())
    if buckets:
        # Bucketed pools make the raw trace non-comparable across samples:
        # per-row CTC loss scales with sequence length, and batches are now
        # length-homogeneous, so the mixed trace oscillates between bucket
        # levels even while every batch improves. Compare each pool batch
        # against ITSELF across time instead (exact — no normalization
        # model needed): first vs last recorded loss per pool index.
        by_idx: dict = {}
        for i, l in zip(loss_pool_idx, losses):
            by_idx.setdefault(i, []).append(l)
        tracked = {i: ls for i, ls in by_idx.items() if len(ls) >= 2}
        if tracked:
            mono = all(ls[0] > ls[-1] for ls in tracked.values())
        else:
            # Short drives may never revisit a pool index (e.g. 60 steps
            # over a 12-batch pool samples indices 0,8,4,11 — all
            # distinct); fall back to the PER improving so a healthy run
            # isn't reported as "loss not decreasing".
            mono = per_after < per_before
    elif len(losses) >= 3:
        # windowed monotonicity: mean of each third strictly decreasing
        # (an empty third's mean is NaN for <3 samples — fall back to a
        # simple first-vs-last check on very short drives)
        thirds = np.array_split(np.asarray(losses), 3)
        mono = thirds[0].mean() > thirds[1].mean() > thirds[2].mean()
    else:
        mono = losses[0] > losses[-1]
    out = {
        "steps": args_cli.steps,
        "losses": losses,
        "monotone_thirds": bool(mono),
        "per_before": round(per_before, 4),
        "per_after": round(per_after, 4),
        "seq_per_s": round(args_cli.batch * args_cli.steps / elapsed, 1),
    }
    if buckets:
        out["bucket_envelopes"] = pool_ts
        out["warmup_compile_s"] = warm_envs
        out["losses_by_pool_idx"] = {
            str(i): [ls[0], ls[-1]] for i, ls in sorted(tracked.items())
        }
    print(json.dumps(out))
    assert mono, "loss not decreasing"
    assert per_after < per_before - 0.05, "PER did not improve"


if __name__ == "__main__":
    main()
