"""Tensor-parallel training parity on the virtual CPU mesh."""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_tp_resume_preserves_training(tmp_path):
    """Interrupt + resume under TP must reproduce the uninterrupted TP
    run exactly (and must not silently drop the Megatron shardings —
    a blanket replicated device_put on restore used to)."""
    import jax

    from neural_speech_decoder_tpu.training.trainer import load_model

    full = run(tmp_path, "tp_full", n_data_devices=2, n_model_devices=2,
               nBatch=8, checkpointEvery=1)
    run(tmp_path, "tp_resume", n_data_devices=2, n_model_devices=2,
        nBatch=4, checkpointEvery=1)
    resumed = run(tmp_path, "tp_resume", n_data_devices=2,
                  n_model_devices=2, nBatch=8, checkpointEvery=1,
                  resume=True)
    assert resumed["summary/best_cer"] == full["summary/best_cer"]
    p1, _, _ = load_model(str(tmp_path / "tp_full"))
    p2, _, _ = load_model(str(tmp_path / "tp_resume"))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


CONF_OVER = dict(
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


def test_qkv_interleave_roundtrip_and_logit_parity():
    """The per-head-interleaved qkv layout is a pure relayout: the
    interleaved forward on interleaved weights == canonical forward on
    canonical weights, bit for bit; de-interleave restores torch order."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        conformer_forward,
        init_conformer_params,
    )
    from neural_speech_decoder_tpu.parallel.shardings import (
        deinterleave_attention_params,
        interleave_attention_params,
    )

    cfg = ConformerConfig(
        n_channels=16, n_days=2, frontend_dim=16, latent_dim=16,
        autoencoder_hidden_dim=12, num_layers=2, num_heads=4, ff_dim=16,
        dropout=0.0, temporal_kernel=8, temporal_stride=4, conv_kernel=5,
        use_spec_augment=False, drop_path_prob=0.0, head_dropout=0.0,
    )
    params = init_conformer_params(jax.random.key(0), cfg=cfg)
    inter = interleave_attention_params(params, cfg.num_heads)
    # round trip restores the canonical layout exactly
    back = deinterleave_attention_params(inter, cfg.num_heads)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the layouts differ (the permutation is not the identity)
    assert not np.array_equal(
        np.asarray(params["blocks"][0]["attn"]["in_proj_w"]),
        np.asarray(inter["blocks"][0]["attn"]["in_proj_w"]),
    )

    x = jax.random.normal(jax.random.key(1), (2, 32, 16))
    days = jnp.array([0, 1], jnp.int32)
    x_lens = jnp.array([32, 24], jnp.int32)
    ref, ref_lens, _ = conformer_forward(
        params, cfg, x, days, x_lens, train=False, key=None
    )
    cfg_i = dataclasses.replace(cfg, qkv_interleaved=True)
    got, got_lens, _ = conformer_forward(
        inter, cfg_i, x, days, x_lens, train=False, key=None
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(ref_lens))


@pytest.mark.slow
def test_conformer_head_tp_matches_single_device(tmp_path):
    """Conformer training over a 2x2 (data x model) mesh with head-parallel
    MHSA must match the single-device run (same seeds, same batches)."""
    s1 = run(tmp_path, "conf_single", n_data_devices=1, n_model_devices=1,
             **CONF_OVER)
    s2 = run(tmp_path, "conf_dp2tp2", n_data_devices=2, n_model_devices=2,
             **CONF_OVER)
    assert abs(s1["summary/best_loss"] - s2["summary/best_loss"]) < 1e-3
    assert s1["summary/best_cer"] == s2["summary/best_cer"]

    import jax

    from neural_speech_decoder_tpu.parallel.shardings import (
        deinterleave_attention_params,
    )
    from neural_speech_decoder_tpu.training.trainer import load_model

    p1, _, _ = load_model(str(tmp_path / "conf_single"))
    p2, _, a2 = load_model(str(tmp_path / "conf_dp2tp2"))
    # TP checkpoints store the interleaved layout; undo it to compare
    p2 = deinterleave_attention_params(p2, a2["transformer_n_heads"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
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
