"""Benchmark: reference-scale training throughput on one TPU chip.

Measures full training-step throughput (forward + CTC + backward +
optimizer) for BOTH reference model families at their baseline recipes:

  * GRU (``/root/reference/scripts/train_model.py:4-31``): B=64, 256
    channels, 5-layer bidirectional GRU H=1024, unfold k=32/s=4, Gaussian
    smoothing, noise augmentation, Adam.
  * Conformer (``/root/reference/scripts/train_conformer.py:7-8``): B=64,
    8 ConformerBlocks d=1024 / ff=2048 / 8 heads, strided-conv frontend,
    SpecAugment, label smoothing 0.1, InterCTC, AdamW.

Both run on synthetic reference-shaped data padded to the static T=1280
envelope (maxTimeSeriesLen 1200 rounded up).

Prints one JSON line per family; the FINAL line is the headline GRU
metric and carries the Conformer numbers as extra keys:
  {"metric": "train_seq_per_s", "value": N, "unit": "seq/s",
   "vs_baseline": R, "conformer_seq_per_s": M, "conformer_vs_baseline": S}
plus driver-guarded shape-lever legs for BOTH families: ``b128_seq_per_s``,
``bucketed_seq_per_s``/``bucketed_speedup``/``bucket_envelopes`` (GRU) and
the ``conformer_``-prefixed B=128 + bucketed keys (attention is O(T²), so
the Conformer gains superlinearly from per-bucket envelopes).

``--rescorer`` adds the reference-scale LLM leg — OPT-6.7B **int8**,
the reference's own 8-bit setting (eval_competition.py:84-86), via
scripts/bench_rescore_6b.py in a subprocess — and embeds
``rescore_6b_sent_per_s`` in the final line. int8 (6.7 GB) rather than
bf16 (13.3 GB): the shared axon chip often has a co-tenant holding a few
GB, and the bf16 build only fits a free 16 GB chip (457.5 sent/s when it
does — BASELINE.md).

``vs_baseline`` denominators are derived A100 estimates for the reference
PyTorch implementation (it publishes no numbers); full accounting +
sensitivity bands in BASELINE.md §"A100 baseline derivation":

  * GRU: 400 seq/s — 248.8 GF/seq train step; cuDNN TF32 (156 TF/s peak,
    the reference leaves torch-1.13 cuDNN defaults) at ~70% on the big
    GEMMs / ~35% on the M=64 sequential recurrence → blended ~88 TF/s.
    Sensitivity band 330-480 (BASELINE.md).
  * Conformer: 350 seq/s — 250.6 GF/seq; assumes the user *enables*
    TF32 matmuls (the reference as written leaves
    ``torch.backends.cuda.matmul.allow_tf32=False``, which would cap the
    A100 at fp32 SGEMM ≈ 17 TF/s → ~65 seq/s; we charge ourselves the
    strong TF32 figure). ~105 TF/s blended on the FF/proj-dominated
    profile, +25% eager-mode elementwise overhead → ~335, rounded up.
    Sensitivity band 300-390 (BASELINE.md).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

A100_BASELINE_SEQ_PER_S = 400.0  # GRU; see module docstring + BASELINE.md
A100_CONFORMER_BASELINE_SEQ_PER_S = 350.0  # TF32-enabled best practice


def bench_family(args, b=64, t=1280, u=64, n_steps=20):
    import jax
    import jax.numpy as jnp

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
    x_lens = jnp.asarray(
        rng.integers(min(400, max(t // 2, 1)), t + 1, size=(b,)),
        dtype=jnp.int32,
    )
    y_lens = jnp.asarray(rng.integers(20, u + 1, size=(b,)), dtype=jnp.int32)
    days = jnp.asarray(rng.integers(0, 24, size=(b,)), dtype=jnp.int32)
    # rbg = the trainer's default RNG (train_model, trainer.py): the TPU
    # hardware generator. A threefry key here would add ~32 ms/step of
    # counter-mode RNG for the noise + dropout draws that the real training
    # path never pays.
    key = jax.random.key(0, impl="rbg")

    # Warmup: compile + 2 steps. NOTE: block via a host transfer (float()),
    # not block_until_ready — the latter is a no-op through the experimental
    # axon TPU tunnel and yields bogus timings.
    for _ in range(3):
        state, metrics = train_step(state, x, y, x_lens, y_lens, days, key)
        float(metrics["train/loss"])

    start = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = train_step(state, x, y, x_lens, y_lens, days, key)
    float(metrics["train/loss"])
    elapsed = time.perf_counter() - start
    return b * n_steps / elapsed


GRU_ARGS = {
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
    "whiteNoiseSD": 0.8,
    "constantOffsetSD": 0.2,
    "lrStart": 0.02,
    "lrEnd": 0.02,
    "l2_decay": 1e-5,
    "nBatch": 10000,
    "seed": 0,
    "compute_dtype": "bfloat16",
    "watch_log_freq": 0,
}

CONFORMER_ARGS = {
    "model_type": "transformer_ctc",
    "nInputFeatures": 256,
    "nClasses": 40,
    "gaussianSmoothWidth": 2.0,
    "whiteNoiseSD": 1.0,
    "constantOffsetSD": 0.2,
    "lrStart": 4e-4,
    "lrEnd": 4e-4,
    "l2_decay": 1e-3,
    "nBatch": 15000,
    "seed": 0,
    "compute_dtype": "bfloat16",
    "watch_log_freq": 0,
    "label_smoothing": 0.1,
    "optimizer": "adamw",
}


def bench_bucketed(args, *, b: int = 64, n_buckets: int = 4,
                   mult: int = 32, key_prefix: str = "",
                   flat: float | None = None, flat_t: int = 1280) -> dict:
    """Length-bucketing leg: effective train throughput when batches are
    padded to per-bucket quantile envelopes (the trainer's
    ``lengthBuckets`` grouped sampler) instead of one worst-case T=1280
    envelope.

    Uses a realistic trial-length distribution (clipped normal,
    mean/max ≈ 0.5 like the competition data — BASELINE.md) and times a
    full train step at each bucket envelope; the effective rate weights
    bucket step times by how many batches each bucket serves — exactly
    the grouped sampler's expectation (buckets chosen ∝ trial count).
    Returns driver-visible keys (round-3 VERDICT #6: the "1.5-2x from
    bucketing" claim was not regression-guarded); ``key_prefix``
    namespaces them per family (the Conformer's O(T²) attention gains
    superlinearly from shorter envelopes). Pass ``flat`` to reuse an
    already-measured flat-envelope rate for the denominator.
    """
    rng = np.random.default_rng(7)
    lens = np.clip(rng.normal(600, 200, size=4096), 100, flat_t)
    qs = np.quantile(lens, np.linspace(0, 1, n_buckets + 1)[1:])
    envelopes = sorted({int(-(-q // mult) * mult) for q in qs})
    # batches per bucket ∝ trials per bucket
    edges = np.concatenate([[0], envelopes])
    weights = np.histogram(lens, bins=edges)[0] / len(lens)

    # Tokens-constant leg (``tokensPerBatch``): per-bucket B_k from the
    # SAME sizing function the trainer uses (bucket_batch_sizes — budget
    # b·flat_t tokens, multiple 64 because the GRU scan's M=2B must fill
    # the 128-row MXU tile; the Conformer measured indifferent), so bench
    # and trainer can never drift.
    from neural_speech_decoder_tpu.data.batching import bucket_batch_sizes

    tok_sizes = bucket_batch_sizes(envelopes, b * flat_t, flat_t, multiple=64)
    eff_time = 0.0
    tok_time = 0.0
    per_bucket = {}
    for t_env, w, b_k in zip(envelopes, weights, tok_sizes):
        if t_env == flat_t and flat is not None:
            seq_s = flat
        else:
            seq_s = bench_family(args, b=b, t=t_env, n_steps=10)
        per_bucket[t_env] = round(seq_s, 1)
        eff_time += w * (b / seq_s)
        # cells where B_k == b reuse the fixed-B measurement
        tok_s = seq_s if b_k == b else bench_family(
            args, b=b_k, t=t_env, n_steps=10)
        tok_time += w / tok_s  # time-per-seq — B_k cancels in the eff
    eff = b / eff_time
    if flat is None:
        flat = bench_family(args, b=b, t=flat_t, n_steps=10)
    return {
        key_prefix + "bucketed_seq_per_s": round(eff, 2),
        key_prefix + "bucketed_speedup": round(eff / flat, 3),
        key_prefix + "bucket_envelopes": per_bucket,
        key_prefix + "tokens_const_seq_per_s": round(1.0 / tok_time, 2),
        key_prefix + "tokens_const_speedup": round(1.0 / tok_time / flat, 3),
    }


def bench_rescorer() -> dict | None:
    """Opt-in leg (``--rescorer``): reference-scale OPT-6.7B int8 rescoring
    (the reference's 8-bit setting) on this chip via
    scripts/bench_rescore_6b.py in a subprocess (own process = its weights
    can't crowd the training benches' HBM). Retries once on its own (so a
    tunnel drop here never re-runs the training legs); returns the
    script's JSON result line, or None after two failures (diagnostics go
    to stderr)."""
    import subprocess

    for attempt in (1, 2):
        try:
            out = subprocess.run(
                [sys.executable, "scripts/bench_rescore_6b.py",
                 "--size", "6.7b", "--dtype", "int8"],
                capture_output=True, text=True, timeout=1800, check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])
        except Exception as e:
            stderr = getattr(e, "stderr", "") or ""
            print(
                f"rescorer leg attempt {attempt} failed "
                f"({type(e).__name__}); stderr tail:\n{stderr[-2000:]}",
                file=sys.stderr,
            )
            if attempt < 2:  # no point backing off after the final try
                time.sleep(30)
    return None


def main() -> None:
    # GRU (the headline) runs and prints FIRST so a tunnel stall during
    # the Conformer leg still leaves a parseable metric as the last JSON
    # line; when both succeed, the final combined line repeats the GRU
    # headline with the Conformer numbers embedded.
    gru_seq_s = bench_family(GRU_ARGS)
    gru_line = {
        "metric": "train_seq_per_s",
        "value": round(gru_seq_s, 2),
        "unit": "seq/s",
        "vs_baseline": round(gru_seq_s / A100_BASELINE_SEQ_PER_S, 3),
    }
    print(json.dumps(gru_line), flush=True)
    # Driver-guarded extra GRU legs (VERDICT r3 #6): B=128 and the
    # length-bucketing effective rate. Failures here must not lose the
    # headline (already printed above) — embed on success only.
    try:
        b128 = bench_family(GRU_ARGS, b=128)
        gru_line["b128_seq_per_s"] = round(b128, 2)
        # flat=: reuse the already-measured headline as the T=1280
        # denominator instead of re-jitting the same config twice.
        gru_line.update(bench_bucketed(GRU_ARGS, flat=gru_seq_s))
        print(json.dumps({k: v for k, v in gru_line.items()
                          if k not in ("metric", "unit")}), flush=True)
    except Exception as e:  # pragma: no cover
        print(f"extra GRU legs failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    conf_seq_s = bench_family(CONFORMER_ARGS)
    print(
        json.dumps(
            {
                "metric": "conformer_train_seq_per_s",
                "value": round(conf_seq_s, 2),
                "unit": "seq/s",
                "vs_baseline": round(
                    conf_seq_s / A100_CONFORMER_BASELINE_SEQ_PER_S, 3
                ),
            }
        ),
        flush=True,
    )
    extra = {}
    # Conformer shape-lever legs (driver-guarded like the GRU legs):
    # B=128 (fills the 128-row MXU tile) and bucketing — attention is
    # O(T²), so per-bucket envelopes gain more than the GRU's linear
    # step. mult=128 matches the MHSA kernel's internal time padding; the
    # top bucket reuses the flat measurement (same envelope).
    try:
        extra["conformer_b128_seq_per_s"] = round(
            bench_family(CONFORMER_ARGS, b=128, n_steps=10), 2
        )
        extra.update(bench_bucketed(
            CONFORMER_ARGS, mult=128, key_prefix="conformer_",
            flat=conf_seq_s,
        ))
        print(json.dumps(extra), flush=True)
    except Exception as e:  # pragma: no cover
        print(f"conformer bucketed leg failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    if "--rescorer" in sys.argv:
        r = bench_rescorer()
        if r is not None:
            print(json.dumps(r), flush=True)
            extra["rescore_6b_sent_per_s"] = r["value"]
            if r.get("peak_hbm_gb") is not None:  # absent via the tunnel
                extra["rescore_6b_peak_hbm_gb"] = r["peak_hbm_gb"]
    print(
        json.dumps(
            {
                **gru_line,
                "conformer_seq_per_s": round(conf_seq_s, 2),
                "conformer_vs_baseline": round(
                    conf_seq_s / A100_CONFORMER_BASELINE_SEQ_PER_S, 3
                ),
                **extra,
            }
        )
    )


def _wait_for_tpu(budget_s: float = 1500.0) -> None:
    """Block until the axon TPU tunnel answers a trivial request.

    The tunnel's failure mode during outages is a HANG (jax backend init
    never returns), not an exception — so an in-process attempt would
    wedge the benchmark beyond rescue. Probe from a killable subprocess
    (it inherits the pinned JAX_PLATFORMS=axon, so it tests exactly the
    backend the bench will use) and wait out transient outages within
    ``budget_s``. Proceeds after the budget either way — the final
    attempt then fails loudly rather than silently skipping the round's
    metric."""
    import subprocess

    probe = ("import jax; print('tpu-ok', len(jax.devices()))")
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=150,
            )
            if out.returncode == 0 and "tpu-ok" in out.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                f"TPU tunnel still unresponsive after {attempt} probes; "
                f"proceeding anyway", file=sys.stderr,
            )
            return
        print(
            f"TPU tunnel probe {attempt} failed; retrying in 60 s",
            file=sys.stderr,
        )
        time.sleep(60)


if __name__ == "__main__":
    # The remote TPU tunnel occasionally drops a request mid-compile (or
    # hangs outright during outages); probe first, then retry the bench
    # itself so a transient drop doesn't lose the round's metric.
    _wait_for_tpu()
    for attempt in (1, 2, 3):
        try:
            main()
            break
        except Exception as e:  # pragma: no cover
            if attempt == 3:
                raise
            print(
                f"bench attempt {attempt} failed ({type(e).__name__}); "
                f"retrying...", file=sys.stderr,
            )
            time.sleep(60)
            _wait_for_tpu(budget_s=600.0)
