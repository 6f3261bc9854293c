"""Conformer logit parity vs the reference torch NeuralTransformerCTCModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.conformer import (
    ConformerConfig,
    conformer_forward,
    init_conformer_params,
)

from _torch_ref import load_reference


def make_cfg(**over):
    base = dict(
        n_channels=8,
        n_classes=6,
        n_days=3,
        frontend_dim=16,
        latent_dim=16,
        autoencoder_hidden_dim=12,
        num_layers=6,
        num_heads=2,
        ff_dim=24,
        dropout=0.0,
        temporal_kernel=8,
        temporal_stride=4,
        gaussian_smooth_width=2.0,
        conv_kernel=5,
        use_spec_augment=False,
        drop_path_prob=0.0,
        head_dropout=0.0,
    )
    base.update(over)
    return ConformerConfig(**base)


def build_torch_model(cfg: ConformerConfig):
    _, _, ref_tfm = load_reference()
    import torch

    torch.manual_seed(0)
    model = ref_tfm.NeuralTransformerCTCModel(
        n_channels=cfg.n_channels,
        n_classes=cfg.n_out,
        n_days=cfg.n_days,
        frontend_dim=cfg.frontend_dim,
        latent_dim=cfg.latent_dim,
        autoencoder_hidden_dim=cfg.autoencoder_hidden_dim,
        transformer_layers=cfg.num_layers,
        transformer_heads=cfg.num_heads,
        transformer_ff_dim=cfg.ff_dim,
        transformer_dropout=cfg.dropout,
        temporal_kernel=cfg.temporal_kernel,
        temporal_stride=cfg.temporal_stride,
        gaussian_smooth_width=cfg.gaussian_smooth_width,
        conformer_conv_kernel=cfg.conv_kernel,
        use_spec_augment=cfg.use_spec_augment,
        drop_path_prob=cfg.drop_path_prob,
        device="cpu",
    )
    with torch.no_grad():
        model.day_linear.day_weights.add_(
            torch.randn_like(model.day_linear.day_weights) * 0.1
        )
        model.day_linear.day_bias.add_(
            torch.randn_like(model.day_linear.day_bias) * 0.1
        )
    return model


def torch_to_pytree(model, cfg: ConformerConfig):
    from neural_speech_decoder_tpu.models.torch_import import (
        import_conformer_state_dict,
    )

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return import_conformer_state_dict(sd, cfg)


def test_conformer_eval_logit_parity():
    import torch

    cfg = make_cfg()
    model = build_torch_model(cfg)
    model.eval()
    params = torch_to_pytree(model, cfg)

    rng = np.random.default_rng(0)
    b, t = 3, 50
    x = rng.standard_normal((b, t, cfg.n_channels)).astype(np.float32)
    day = np.array([0, 1, 2], dtype=np.int64)
    x_lens = np.array([50, 44, 37], dtype=np.int32)

    with torch.no_grad():
        ref_lp, ref_lens, ref_inter = model(
            torch.from_numpy(x),
            torch.from_numpy(day),
            torch.from_numpy(x_lens),
        )
    ref_lp = ref_lp.numpy().transpose(1, 0, 2)  # [T,B,K] -> [B,T,K]

    ours_lp, ours_lens, ours_inter = conformer_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(day), jnp.asarray(x_lens),
        train=False,
    )
    assert ref_inter is None and ours_inter is None
    np.testing.assert_array_equal(np.asarray(ours_lens), ref_lens.numpy())
    # Compare only valid frames: padded frames see mask-value differences
    # (-1e9 vs -inf) that are irrelevant downstream.
    for i in range(b):
        n = int(ref_lens[i])
        np.testing.assert_allclose(
            np.asarray(ours_lp)[i, :n], ref_lp[i, :n], atol=5e-4
        )


def test_conformer_interctc_train_mode_parity():
    """With all stochastic rates at 0, train mode is deterministic and must
    match torch train mode incl. the InterCTC tap at layer L/2."""
    import torch

    cfg = make_cfg()
    model = build_torch_model(cfg)
    model.train()
    params = torch_to_pytree(model, cfg)

    rng = np.random.default_rng(1)
    b, t = 2, 40
    x = rng.standard_normal((b, t, cfg.n_channels)).astype(np.float32)
    day = np.array([0, 2], dtype=np.int64)
    x_lens = np.array([40, 33], dtype=np.int32)

    with torch.no_grad():
        ref_lp, ref_lens, ref_inter = model(
            torch.from_numpy(x), torch.from_numpy(day), torch.from_numpy(x_lens)
        )
    assert ref_inter is not None
    ours_lp, ours_lens, ours_inter = conformer_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(day), jnp.asarray(x_lens),
        train=True, key=jax.random.key(0),
    )
    assert ours_inter is not None
    # Only the InterCTC tap is deterministic in torch train mode: the deep
    # head contains a hardcoded Dropout(0.3) (transformer_ctc.py:423) that
    # randomizes the final log-probs there. Our head_dropout is config-zeroed.
    for i in range(b):
        n = int(ref_lens[i])
        np.testing.assert_allclose(
            np.asarray(ours_inter)[i, :n],
            ref_inter.numpy().transpose(1, 0, 2)[i, :n],
            atol=5e-4,
        )
    assert np.isfinite(np.asarray(ours_lp)).all()


def test_init_structure_matches_torch_shapes():
    cfg = make_cfg()
    params = init_conformer_params(jax.random.key(0), cfg=cfg)
    model = build_torch_model(cfg)
    converted = torch_to_pytree(model, cfg)
    ours_tree = jax.tree.structure(params)
    ref_tree = jax.tree.structure(converted)
    assert ours_tree == ref_tree
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(converted)):
        assert a.shape == b.shape
