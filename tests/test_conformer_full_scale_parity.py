"""Conformer logit parity vs torch at REFERENCE SCALE.

``test_conformer_parity.py`` pins the math at latent_dim=16 / 6 layers;
this gate runs the real recipe from ``/root/reference/src/neural_decoder/
transformer_ctc.py:333-501`` + ``scripts/train_conformer.py:7-58`` —
256 channels, frontend/latent 1024, bottleneck 512, 8 ConformerBlocks,
8 heads, ff 2048, depthwise conv k=31, unfold k=32/s=4 — so fp32
accumulation across 8 blocks at d=1024 (exactly where drift would hide,
round-3 VERDICT missing #2) is exercised, and ``torch_import`` is
validated on a full-size Conformer checkpoint.

fp32 end to end (the bit-parity mode); the bf16/Pallas production path is
covered by the fused-attention oracle tests + on-chip drives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neural_speech_decoder_tpu.models.conformer import (
    ConformerConfig,
    conformer_forward,
)

from test_conformer_parity import build_torch_model, torch_to_pytree

FULL_CFG = ConformerConfig(
    n_channels=256,
    n_classes=40,
    n_days=24,
    frontend_dim=1024,
    latent_dim=1024,
    autoencoder_hidden_dim=512,
    num_layers=8,
    num_heads=8,
    ff_dim=2048,
    dropout=0.0,
    temporal_kernel=32,
    temporal_stride=4,
    gaussian_smooth_width=2.0,
    conv_kernel=31,
    use_spec_augment=False,
    drop_path_prob=0.0,
    head_dropout=0.0,
)


@pytest.mark.slow
def test_conformer_full_scale_logit_parity():
    import torch

    cfg = FULL_CFG
    model = build_torch_model(cfg)
    model.eval()
    params = torch_to_pytree(model, cfg)

    rng = np.random.default_rng(23)
    b, t = 2, 613  # realistic sentence length (~12 s), deliberately uneven
    x = rng.standard_normal((b, t, cfg.n_channels)).astype(np.float32)
    day = np.array([5, 19], dtype=np.int64)
    x_lens = np.array([613, 487], dtype=np.int32)

    with torch.no_grad():
        ref_lp, ref_lens, ref_inter = model(
            torch.from_numpy(x),
            torch.from_numpy(day),
            torch.from_numpy(x_lens),
        )
    assert ref_inter is None
    ref_lp = ref_lp.numpy().transpose(1, 0, 2)  # [T,B,K] -> [B,T,K]

    ours_lp, ours_lens, ours_inter = conformer_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(day), jnp.asarray(x_lens),
        train=False,
    )
    assert ours_inter is None
    np.testing.assert_array_equal(np.asarray(ours_lens), ref_lens.numpy())
    # fp32 drift through 8 blocks at d=1024 lands ~1e-4 on log-probs of
    # magnitude O(1-10); 2e-3 leaves margin while catching real
    # layout/semantics bugs (which produce O(1) diffs). Compare valid
    # frames only (padded frames differ via -1e9 vs -inf mask values).
    worst = 0.0
    for i in range(b):
        n = int(ref_lens[i])
        d = float(np.max(np.abs(np.asarray(ours_lp)[i, :n] - ref_lp[i, :n])))
        worst = max(worst, d)
        np.testing.assert_allclose(
            np.asarray(ours_lp)[i, :n], ref_lp[i, :n], atol=2e-3
        )
    assert worst < 2e-3
