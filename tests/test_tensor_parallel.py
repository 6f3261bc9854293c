"""Tensor-parallel training parity on the virtual CPU mesh."""

import numpy as np

from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
from neural_speech_decoder_tpu.training.trainer import train_model


def run(tmp_path, name, **over):
    args = {
        "outputDir": str(tmp_path / name),
        "dataset": synthetic_dataset(
            seed=0, n_days=2, trials_per_day=10, n_channels=16,
            min_t=40, max_t=60, min_u=2, max_u=4, signal_scale=3.0,
        ),
        "batchSize": 4,
        "lrStart": 0.01,
        "lrEnd": 0.01,
        "l2_decay": 0.0,
        "nBatch": 8,
        "evalEvery": 4,
        "whiteNoiseSD": 0.0,
        "constantOffsetSD": 0.0,
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
    args.update(over)
    return train_model(args)


def test_dp_x_tp_matches_single_device(tmp_path):
    """GRU training over a 2x2 (data x model) mesh must match the
    single-device run exactly (same seeds drive identical batches/noise)."""
    s1 = run(tmp_path, "single", n_data_devices=1, n_model_devices=1)
    s2 = run(tmp_path, "dp2tp2", n_data_devices=2, n_model_devices=2)
    assert abs(s1["summary/best_loss"] - s2["summary/best_loss"]) < 1e-3
    assert s1["summary/best_cer"] == s2["summary/best_cer"]

    import jax

    from neural_speech_decoder_tpu.training.trainer import load_model

    p1, _, _ = load_model(str(tmp_path / "single"))
    p2, _, _ = load_model(str(tmp_path / "dp2tp2"))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_conformer_tp_smoke(tmp_path):
    s = run(
        tmp_path,
        "conf_tp",
        n_model_devices=2,
        model_type="transformer_ctc",
        temporal_kernel=8,
        temporal_stride=4,
        gaussian_smooth_width=2.0,
        frontend_dim=16,
        latent_dim=16,
        autoencoder_hidden_dim=12,
        transformer_num_layers=2,
        transformer_n_heads=2,
        transformer_dim_ff=16,
        transformer_dropout=0.0,
        conformer_conv_kernel=5,
        drop_path_prob=0.0,
        optimizer="adamw",
        lrStart=1e-3,
        weight_decay=0.0,
        warmup_steps=2,
        label_smoothing=0.1,
        use_spec_augment=False,
    )
    assert np.isfinite(s["summary/final_loss"])
