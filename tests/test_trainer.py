"""End-to-end trainer smoke + learning tests on synthetic data."""

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
from neural_speech_decoder_tpu.training.trainer import load_model, train_model


def small_args(tmp_path, **overrides):
    args = {
        "outputDir": str(tmp_path / "run"),
        "dataset": synthetic_dataset(
            seed=0, n_days=2, trials_per_day=12, n_channels=16,
            min_t=40, max_t=80, min_u=2, max_u=5, signal_scale=2.0,
        ),
        "batchSize": 8,
        "lrStart": 0.02,
        "lrEnd": 0.02,
        "l2_decay": 1e-5,
        "nBatch": 30,
        "evalEvery": 10,
        "whiteNoiseSD": 0.2,
        "constantOffsetSD": 0.05,
        "gaussianSmoothWidth": 2.0,
        "nUnits": 32,
        "nLayers": 2,
        "nInputFeatures": 16,
        "nClasses": 40,
        "dropout": 0.0,
        "strideLen": 4,
        "kernelLen": 8,
        "bidirectional": True,
        "seed": 0,
        "wandb_mode": "disabled",
        "time_multiple": 16,
    }
    args.update(overrides)
    return args


def test_gru_training_reduces_loss(tmp_path):
    args = small_args(tmp_path)
    summary = train_model(args)
    import pickle

    with open(str(tmp_path / "run" / "trainingStats"), "rb") as f:
        stats = pickle.load(f)
    assert len(stats["testLoss"]) == 3  # evals at steps 0, 10, 20
    assert stats["testLoss"][-1] < stats["testLoss"][0]
    assert np.isfinite(summary["summary/final_cer"])


def test_checkpoint_roundtrip_and_load_model(tmp_path):
    args = small_args(tmp_path)
    train_model(args)
    params, model, loaded_args = load_model(str(tmp_path / "run"), 2)
    assert loaded_args["nUnits"] == 32
    # Forward pass on a fresh batch works and has the right output shape.
    import jax.numpy as jnp

    x = jnp.zeros((2, 48, 16))
    log_probs, out_lens, _ = model.forward(
        params, x, jnp.array([0, 1]), jnp.array([48, 40]), train=False, key=None
    )
    assert log_probs.shape == (2, (48 - 8) // 4 + 1, 41)
    np.testing.assert_array_equal(np.asarray(out_lens), [10, 8])


def test_artifacts_contract(tmp_path):
    args = small_args(
        tmp_path, nBatch=11, evalEvery=10, wandb_mode="offline",
        watch_log_freq=10,
    )
    train_model(args)
    run = tmp_path / "run"
    assert (run / "args").exists()
    assert (run / "trainingStats").exists()
    assert (run / "metrics.jsonl").exists()
    assert (run / "lastState").exists()
    # wandb.watch parity (neural_decoder_trainer.py:122): per-layer grad and
    # param norms appear on the watch interval, and only there.
    import json

    recs = [
        json.loads(line)
        for line in (run / "metrics.jsonl").read_text().splitlines()
    ]
    watch_steps = {
        r["step"] for r in recs
        if any(k.startswith("train/grad_norm/") for k in r)
    }
    assert watch_steps == {0, 10}
    watched = next(r for r in recs if r["step"] == 10 and
                   any(k.startswith("train/grad_norm/") for k in r))
    assert "train/grad_norm/gru/layers/0/w_hh" in watched
    assert "train/param_norm/fc/weight" in watched
    assert all(np.isfinite(v) for k, v in watched.items()
               if k.startswith("train/grad_norm/"))
