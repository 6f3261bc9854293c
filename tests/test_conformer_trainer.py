"""Conformer (transformer_ctc) training path: label smoothing + InterCTC +
AdamW/warmup-cosine + grad clipping, end-to-end through train_model."""

import pickle

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
from neural_speech_decoder_tpu.training.trainer import train_model


@pytest.mark.slow
def test_conformer_training_smoke(tmp_path):
    args = {
        "outputDir": str(tmp_path / "conf"),
        "dataset": synthetic_dataset(
            seed=0, n_days=2, trials_per_day=10, n_channels=12,
            min_t=40, max_t=70, min_u=2, max_u=4, signal_scale=3.0,
        ),
        "batchSize": 4,
        "nBatch": 12,
        "evalEvery": 5,
        "seed": 0,
        "model_type": "transformer_ctc",
        "nInputFeatures": 12,
        "nClasses": 40,
        "temporal_kernel": 8,
        "temporal_stride": 4,
        "gaussian_smooth_width": 2.0,
        "whiteNoiseSD": 0.2,
        "constantOffsetSD": 0.05,
        "frontend_dim": 16,
        "latent_dim": 16,
        "autoencoder_hidden_dim": 12,
        "transformer_num_layers": 6,  # >= 6 so InterCTC engages
        "transformer_n_heads": 2,
        "transformer_dim_ff": 24,
        "transformer_dropout": 0.1,
        "conformer_conv_kernel": 5,
        "drop_path_prob": 0.1,
        "optimizer": "adamw",
        "lrStart": 4e-4,
        "lrEnd": 1e-4,
        "weight_decay": 1e-3,
        "warmup_steps": 4,
        "label_smoothing": 0.1,
        "use_spec_augment": True,
        "spec_augment_freq_mask": 6,
        "spec_augment_time_mask": 4,
        "interctc_weight": 0.3,
        "wandb_mode": "offline",
        "time_multiple": 16,
    }
    summary = train_model(args)
    assert np.isfinite(summary["summary/final_loss"])

    with open(str(tmp_path / "conf" / "trainingStats"), "rb") as f:
        stats = pickle.load(f)
    assert len(stats["testLoss"]) == 3
    assert np.isfinite(stats["testLoss"]).all()

    # The metric log must contain the Conformer-specific training metrics
    # (train/ctc_loss, kl_loss, inter_ctc_loss, main_loss, grad_norm).
    import json

    seen = set()
    with open(str(tmp_path / "conf" / "metrics.jsonl")) as f:
        for line in f:
            seen.update(json.loads(line).keys())
    for k in (
        "train/ctc_loss",
        "train/kl_loss",
        "train/inter_ctc_loss",
        "train/main_loss",
        "train/grad_norm",
        "eval/cer",
    ):
        assert k in seen, k
