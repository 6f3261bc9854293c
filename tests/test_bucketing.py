"""Length-bucketed batching: correctness and trainer integration."""

import numpy as np

from neural_speech_decoder_tpu.data.batching import (
    bucket_for,
    choose_envelope,
    length_buckets,
    sample_batch,
)
from neural_speech_decoder_tpu.data.dataset import pack_days
from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
from neural_speech_decoder_tpu.training.trainer import train_model


def test_bucket_construction_and_selection():
    raw = synthetic_dataset(seed=0, n_days=2, trials_per_day=30,
                            n_channels=8, min_t=40, max_t=200)
    ds = pack_days(raw["train"])
    t_max, _ = choose_envelope(ds, time_multiple=32)
    buckets = length_buckets(ds, 3, t_max, time_multiple=32)
    assert buckets[-1] == t_max
    assert buckets == sorted(buckets)
    assert all(b % 32 == 0 or b == t_max for b in buckets)
    assert bucket_for(buckets, 1) == buckets[0]
    assert bucket_for(buckets, t_max) == t_max
    assert bucket_for(buckets, t_max + 999) == t_max  # fallback


def test_bucketed_sampling_preserves_content():
    raw = synthetic_dataset(seed=1, n_days=1, trials_per_day=20,
                            n_channels=8, min_t=40, max_t=160)
    ds = pack_days(raw["train"])
    t_max, u_max = choose_envelope(ds, time_multiple=32)
    buckets = length_buckets(ds, 3, t_max, time_multiple=32)
    rng = np.random.default_rng(0)
    seen_ts = set()
    for _ in range(20):
        b = sample_batch(ds, rng, 4, t_max, u_max, buckets=buckets)
        seen_ts.add(b.x.shape[1])
        assert b.x.shape[1] >= b.x_lens.max()
        # all valid content present, padding zero
        for i in range(4):
            assert np.abs(b.x[i, : b.x_lens[i]]).sum() > 0
            assert np.abs(b.x[i, b.x_lens[i]:]).sum() == 0
    assert len(seen_ts) > 1, "bucketing never produced a smaller envelope"


def test_buckets_engage_at_production_batch_size():
    """Pad-to-batch-max never engages short buckets once B is large (any
    uniform B=64 draw almost surely contains a near-max trial) — the
    grouped sampler must still produce small envelopes."""
    raw = synthetic_dataset(seed=2, n_days=4, trials_per_day=64,
                            n_channels=8, min_t=40, max_t=400)
    ds = pack_days(raw["train"])
    t_max, u_max = choose_envelope(ds, time_multiple=32)
    buckets = length_buckets(ds, 4, t_max, time_multiple=32)
    rng = np.random.default_rng(0)
    seen = {sample_batch(ds, rng, 64, t_max, u_max, buckets=buckets).x.shape[1]
            for _ in range(40)}
    assert len(seen) >= 3, f"buckets never engaged at B=64: {seen}"
    # every batch envelope is a real bucket ceiling and covers its content
    assert seen <= set(buckets)


def test_bucketed_sampling_marginal_is_uniform(monkeypatch):
    """Anchor-bucket sampling must keep each trial's selection probability
    at the uniform B/N (bucket chosen ∝ size cancels within-bucket 1/n_k)."""
    from neural_speech_decoder_tpu.data import batching

    raw = synthetic_dataset(seed=3, n_days=2, trials_per_day=48,
                            n_channels=8, min_t=40, max_t=300)
    ds = pack_days(raw["train"])
    t_max, u_max = choose_envelope(ds, time_multiple=32)
    buckets = length_buckets(ds, 3, t_max, time_multiple=32)

    counts = np.zeros(ds.n_trials)
    real_gather = batching._gather

    def spy(ds_, idx, *a, **kw):
        counts[idx] += 1
        return real_gather(ds_, idx, *a, **kw)

    monkeypatch.setattr(batching, "_gather", spy)
    rng = np.random.default_rng(1)
    n_draws, b = 3000, 8
    for _ in range(n_draws):
        sample_batch(ds, rng, b, t_max, u_max, buckets=buckets)
    expected = n_draws * b / ds.n_trials
    sigma = np.sqrt(n_draws * (b / ds.n_trials))  # binomial, (1-p) dropped
    assert np.all(np.abs(counts - expected) < 4.5 * sigma), (
        counts.min(), counts.max(), expected)


def test_bucketed_eval_covers_everything_and_shrinks():
    """Bucketed eval batches must cover every trial exactly once (weights
    mask the pad rows), produce smaller envelopes, and keep per-trial
    content identical to the flat iterator."""
    from neural_speech_decoder_tpu.data.batching import eval_batches

    raw = synthetic_dataset(seed=4, n_days=3, trials_per_day=21,
                            n_channels=8, min_t=40, max_t=300)
    ds = pack_days(raw["test"])
    t_max, u_max = choose_envelope(ds, time_multiple=32)
    buckets = length_buckets(ds, 3, t_max, time_multiple=32)

    def collect(buckets_arg):
        rows = {}
        envs = set()
        for b in eval_batches(ds, 8, t_max, u_max, buckets=buckets_arg):
            envs.add(b.x.shape[1])
            for j in range(8):
                if b.weight[j] == 0:
                    continue
                key = (int(b.days[j]), int(b.x_lens[j]),
                       b.x[j, 0].tobytes(), b.y[j].tobytes())
                assert key not in rows, "trial visited twice"
                rows[key] = np.abs(b.x[j, : b.x_lens[j]]).sum()
        return rows, envs

    flat_rows, flat_envs = collect(None)
    buck_rows, buck_envs = collect(buckets)
    assert len(flat_rows) == len(buck_rows) == ds.n_trials
    assert set(flat_rows) == set(buck_rows)
    assert flat_envs == {t_max}
    assert len(buck_envs) > 1 and min(buck_envs) < t_max


def test_tokens_constant_sizes_and_marginal(monkeypatch):
    """tokensPerBatch path: B_k = budget/T_k (multiple of 8, capped), and
    the ∝ n_k/B_k bucket draw keeps each trial's expected visit count
    uniform even though short buckets carry more rows per step."""
    from neural_speech_decoder_tpu.data import batching
    from neural_speech_decoder_tpu.data.batching import bucket_batch_sizes

    raw = synthetic_dataset(seed=5, n_days=2, trials_per_day=48,
                            n_channels=8, min_t=40, max_t=300)
    ds = pack_days(raw["train"])
    t_max, u_max = choose_envelope(ds, time_multiple=32)
    buckets = length_buckets(ds, 3, t_max, time_multiple=32)
    budget = 16 * t_max
    sizes = bucket_batch_sizes(buckets, budget, t_max, max_batch=64)
    assert all(s % 8 == 0 and 8 <= s <= 64 for s in sizes)
    assert sizes[-1] == 16 and sizes == sorted(sizes, reverse=True)

    counts = np.zeros(ds.n_trials)
    real_gather = batching._gather

    def spy(ds_, idx, t_env, *a, **kw):
        # every batch's row count matches its envelope's budgeted size
        assert len(idx) == sizes[buckets.index(t_env)]
        counts[idx] += 1
        return real_gather(ds_, idx, t_env, *a, **kw)

    monkeypatch.setattr(batching, "_gather", spy)
    rng = np.random.default_rng(2)
    n_draws = 2500
    for _ in range(n_draws):
        sample_batch(ds, rng, 16, t_max, u_max, buckets=buckets,
                     bucket_sizes=sizes)
    expected = counts.sum() / ds.n_trials
    sigma = np.sqrt(expected)  # ~Poisson per-trial visit count
    assert np.all(np.abs(counts - expected) < 5 * sigma), (
        counts.min(), counts.max(), expected)


def test_trainer_tokens_constant_runs_and_learns(tmp_path):
    args = {
        "outputDir": str(tmp_path / "run"),
        "dataset": synthetic_dataset(
            seed=0, n_days=2, trials_per_day=16, n_channels=12,
            min_t=30, max_t=120, min_u=2, max_u=4, signal_scale=3.0,
        ),
        "batchSize": 4,
        "lrStart": 0.01,
        "lrEnd": 0.01,
        "l2_decay": 0.0,
        "nBatch": 20,
        "evalEvery": 10,
        "whiteNoiseSD": 0.1,
        "constantOffsetSD": 0.0,
        "gaussianSmoothWidth": 2.0,
        "nUnits": 16,
        "nLayers": 2,
        "nInputFeatures": 12,
        "nClasses": 40,
        "dropout": 0.0,
        "strideLen": 4,
        "kernelLen": 8,
        "bidirectional": True,
        "seed": 0,
        "wandb_mode": "disabled",
        "time_multiple": 16,
        "lengthBuckets": 3,
        "tokensPerBatch": 4 * 120,
        "maxBatchSize": 16,
        "batchMultiple": 4,  # tiny-model test; production default is 64
    }
    summary = train_model(args)
    assert np.isfinite(summary["summary/final_loss"])


def test_trainer_with_buckets_runs_and_learns(tmp_path):
    args = {
        "outputDir": str(tmp_path / "run"),
        "dataset": synthetic_dataset(
            seed=0, n_days=2, trials_per_day=16, n_channels=12,
            min_t=30, max_t=120, min_u=2, max_u=4, signal_scale=3.0,
        ),
        "batchSize": 4,
        "lrStart": 0.01,
        "lrEnd": 0.01,
        "l2_decay": 0.0,
        "nBatch": 20,
        "evalEvery": 10,
        "whiteNoiseSD": 0.1,
        "constantOffsetSD": 0.0,
        "gaussianSmoothWidth": 2.0,
        "nUnits": 16,
        "nLayers": 2,
        "nInputFeatures": 12,
        "nClasses": 40,
        "dropout": 0.0,
        "strideLen": 4,
        "kernelLen": 8,
        "bidirectional": True,
        "seed": 0,
        "wandb_mode": "disabled",
        "time_multiple": 16,
        "lengthBuckets": 3,
    }
    summary = train_model(args)
    assert np.isfinite(summary["summary/final_loss"])
