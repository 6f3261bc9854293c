"""Device-resident data path: on-device batch assembly parity + trainer
bit-parity, plus the round-5 tokens-constant gradient-weighting fixes."""

import pickle
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoder_tpu.data.batching import (
    Batch,
    bucket_batch_sizes,
    choose_envelope,
    eval_batches,
    length_buckets,
    sample_batch,
)
from neural_speech_decoder_tpu.data.dataset import pack_days
from neural_speech_decoder_tpu.data.device_data import DeviceData
from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
from neural_speech_decoder_tpu.training.trainer import train_model

from test_trainer import small_args


@pytest.fixture(scope="module")
def packed():
    raw = synthetic_dataset(
        seed=3, n_days=3, trials_per_day=10, n_channels=8,
        min_t=20, max_t=90, min_u=2, max_u=6,
    )
    return pack_days(raw["train"])


def test_assemble_matches_host_gather_flat(packed):
    rng = np.random.default_rng(0)
    t_max, u_max = choose_envelope(packed, time_multiple=16)
    host = sample_batch(packed, rng, 6, t_max, u_max)
    rng2 = np.random.default_rng(0)
    lean = sample_batch(packed, rng2, 6, t_max, u_max, materialize_x=False)
    assert lean.x is None
    np.testing.assert_array_equal(host.idx, lean.idx)
    dd = DeviceData(packed)
    x, y, x_lens, y_lens, days = dd.assemble(lean)
    np.testing.assert_array_equal(np.asarray(x), host.x)
    np.testing.assert_array_equal(np.asarray(y), host.y)
    np.testing.assert_array_equal(np.asarray(x_lens), host.x_lens)
    np.testing.assert_array_equal(np.asarray(y_lens), host.y_lens)
    np.testing.assert_array_equal(np.asarray(days), host.days)


def test_assemble_matches_host_gather_bucketed(packed):
    t_max, u_max = choose_envelope(packed, time_multiple=16)
    buckets = length_buckets(packed, 3, t_max, time_multiple=16)
    sizes = bucket_batch_sizes(buckets, 4 * t_max, t_max, multiple=2)
    dd = DeviceData(packed)
    for draw in range(6):
        rng = np.random.default_rng(100 + draw)
        host = sample_batch(packed, rng, 4, t_max, u_max, buckets=buckets,
                            bucket_sizes=sizes)
        rng2 = np.random.default_rng(100 + draw)
        lean = sample_batch(packed, rng2, 4, t_max, u_max, buckets=buckets,
                            bucket_sizes=sizes, materialize_x=False)
        assert lean.t_env == host.x.shape[1]
        x, *_ = dd.assemble(lean)
        np.testing.assert_array_equal(np.asarray(x), host.x)


def test_eval_batches_lean_cover_identically(packed):
    t_max, u_max = choose_envelope(packed, time_multiple=16)
    dd = DeviceData(packed)
    host_iter = eval_batches(packed, 4, t_max, u_max)
    lean_iter = eval_batches(packed, 4, t_max, u_max, materialize_x=False)
    n = 0
    for host, lean in zip(host_iter, lean_iter):
        x, *_ = dd.assemble(lean)
        np.testing.assert_array_equal(np.asarray(x), host.x)
        np.testing.assert_array_equal(host.weight, lean.weight)
        n += 1
    assert n == -(-packed.n_trials // 4)


def test_train_model_device_resident_bit_parity(tmp_path):
    """deviceResidentData changes WHERE the batch is assembled, not what the
    trainer computes: same seed -> identical metric history."""
    stats = {}
    for mode in (False, True):
        args = small_args(
            tmp_path / f"dr{mode}", nBatch=12, evalEvery=5,
            deviceResidentData=mode,
        )
        train_model(args)
        with open(str(tmp_path / f"dr{mode}" / "run" / "trainingStats"),
                  "rb") as f:
            stats[mode] = pickle.load(f)
    np.testing.assert_array_equal(stats[False]["testLoss"],
                                  stats[True]["testLoss"])
    np.testing.assert_array_equal(stats[False]["testCER"],
                                  stats[True]["testCER"])


def test_device_resident_bucketed_trainer_runs(tmp_path):
    args = small_args(
        tmp_path, nBatch=8, evalEvery=4, deviceResidentData=True,
        lengthBuckets=3, tokensPerBatch=8 * 96, batchMultiple=4,
    )
    summary = train_model(args)
    assert np.isfinite(summary["summary/final_cer"])


def test_tokens_loss_scale_restores_uniform_weight():
    """With tokensPerBatch set, the loss is scaled by B_k/batchSize so a
    trial's gradient weight is 1/batchSize regardless of its bucket."""
    from neural_speech_decoder_tpu.training.trainer import (
        _loss_and_metrics,
        build_model,
    )

    args = {
        "model_type": "gru_baseline", "nInputFeatures": 8, "nClasses": 40,
        "nUnits": 16, "nLayers": 1, "dropout": 0.0, "strideLen": 4,
        "kernelLen": 8, "gaussianSmoothWidth": 2.0, "bidirectional": False,
        "whiteNoiseSD": 0.0, "constantOffsetSD": 0.0, "batchSize": 8,
    }
    model = build_model(args, n_days=1)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b_k = 4
    x = jnp.asarray(rng.standard_normal((b_k, 32, 8)), jnp.float32)
    batch = (x, jnp.ones((b_k, 3), jnp.int32), jnp.full((b_k,), 32),
             jnp.full((b_k,), 3), jnp.zeros((b_k,), jnp.int32))
    key = jax.random.key(1)
    plain, _ = _loss_and_metrics(args, model, params, batch, key)
    scaled, _ = _loss_and_metrics(
        {**args, "tokensPerBatch": 1024}, model, params, batch, key
    )
    np.testing.assert_allclose(float(scaled), float(plain) * b_k / 8,
                               rtol=1e-6)
    off, _ = _loss_and_metrics(
        {**args, "tokensPerBatch": 1024, "tokensLossScale": False},
        model, params, batch, key,
    )
    assert float(off) == float(plain)


def test_bucket_batch_sizes_warns_on_floor_clamp():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sizes = bucket_batch_sizes([128, 512], token_budget=16384,
                                   t_max=512, multiple=64)
    assert sizes == [128, 64]  # second bucket clamped up from 32
    assert any("clamping up" in str(x.message) for x in w)


def test_n_data_divides_batch_multiple_under_tokens_per_batch(tmp_path):
    """8 virtual devices, batchSize=12 (old code picked n_data=6), B_k
    multiples of 4 — the mesh must now be constrained to divide
    batchMultiple so bucketed steps shard evenly."""
    args = small_args(
        tmp_path, batchSize=12, nBatch=6, evalEvery=3, lengthBuckets=3,
        tokensPerBatch=4 * 96, batchMultiple=4,
    )
    summary = train_model(args)
    assert np.isfinite(summary["summary/final_cer"])
