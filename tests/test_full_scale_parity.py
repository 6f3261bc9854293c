"""Logit parity vs the reference torch GRUDecoder at REFERENCE SCALE.

Round-1 parity tests pinned the math at toy dimensions only; this gate runs
the real baseline configuration from ``/root/reference/scripts/
train_model.py:4-31`` — 256 input channels, hidden 1024, 5 bidirectional
layers, 24 days, unfold k=32/s=4, Gaussian σ=2.0 — so numerical
accumulation over ~150 scan steps at H=1024 is exercised, and the
``torch_import`` migration path is validated on a full-size checkpoint.

fp32 end to end (the bit-parity mode); the Pallas/bf16 production path is
pinned separately by ``test_pallas_real_shape.py`` on TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neural_speech_decoder_tpu.models.gru import GRUConfig, gru_forward
from neural_speech_decoder_tpu.models.torch_import import import_gru_state_dict

from _torch_ref import torch_gru_decoder

FULL_CFG = GRUConfig(
    neural_dim=256,
    n_classes=40,
    hidden_dim=1024,
    num_layers=5,
    n_days=24,
    dropout=0.0,
    stride_len=4,
    kernel_len=32,
    gaussian_smooth_width=2.0,
    bidirectional=True,
)


@pytest.mark.slow
def test_full_scale_logit_parity():
    import torch

    cfg = FULL_CFG
    model = torch_gru_decoder(
        neural_dim=cfg.neural_dim,
        n_classes=cfg.n_classes,
        hidden_dim=cfg.hidden_dim,
        layer_dim=cfg.num_layers,
        nDays=cfg.n_days,
        dropout=0.0,
        strideLen=cfg.stride_len,
        kernelLen=cfg.kernel_len,
        gaussianSmoothWidth=cfg.gaussian_smooth_width,
        bidirectional=cfg.bidirectional,
    )
    model.eval()
    # Perturb day weights/bias away from identity/zero so the day layer is a
    # real transform, as after training.
    with torch.no_grad():
        model.dayWeights.add_(torch.randn_like(model.dayWeights) * 0.05)
        model.dayBias.add_(torch.randn_like(model.dayBias) * 0.05)

    rng = np.random.default_rng(11)
    b, t = 2, 613  # realistic sentence length (~12 s), deliberately uneven
    x = rng.standard_normal((b, t, cfg.neural_dim)).astype(np.float32)
    day = np.array([3, 21], dtype=np.int64)

    with torch.no_grad():
        ref = model(torch.from_numpy(x), torch.from_numpy(day)).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = import_gru_state_dict(sd, cfg)
    ours = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray(day), train=False)
    )

    assert ours.shape == ref.shape == (b, (t - 32) // 4 + 1, 41)
    # fp32 accumulation over ~150 steps at H=1024: observed max abs diff is
    # O(1e-5) on logits of magnitude O(1); 1e-3 leaves safety margin while
    # still catching any real layout/semantics bug.
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    assert float(np.max(np.abs(ours - ref))) < 1e-3
