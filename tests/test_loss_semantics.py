"""Reference loss-blending semantics pinned against a literal torch replica.

Covers the two subtle reductions the reference trainer applies
(neural_decoder_trainer.py:133-141, 221-248):
  * label_smoothing == 0: CTCLoss(reduction='mean') is torch-mean
    (length-normalized), and torch.sum of that scalar is a no-op — the
    InterCTC term must therefore also be a torch-mean;
  * label_smoothing > 0: kl_div(reduction='batchmean') on [T', B, K]
    divides by T' (the first dim), not the batch size.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.training.trainer import _loss_and_metrics, build_model


def _torch_reference_loss(log_probs, inter_log_probs, y, out_lens, y_lens,
                          label_smoothing, interctc_weight, n_classes):
    """Literal transcription of the reference's loss blending."""
    import torch

    lp = torch.from_numpy(log_probs).permute(1, 0, 2)  # [T, B, K]
    ilp = torch.from_numpy(inter_log_probs).permute(1, 0, 2)
    y_t = torch.from_numpy(y)
    ol = torch.from_numpy(out_lens)
    yl = torch.from_numpy(y_lens)
    if label_smoothing > 0:
        loss_ctc = torch.nn.CTCLoss(blank=0, reduction="none",
                                    zero_infinity=True)
    else:
        loss_ctc = torch.nn.CTCLoss(blank=0, reduction="mean",
                                    zero_infinity=True)
    loss = loss_ctc(lp, y_t, ol, yl)
    inter_loss = loss_ctc(ilp, y_t, ol, yl)
    inter_loss = (
        torch.mean(inter_loss) if label_smoothing > 0 else torch.sum(inter_loss)
    )
    if label_smoothing > 0:
        ctc = torch.mean(loss)
        uniform = torch.full_like(lp, -math.log(n_classes))
        kl = torch.nn.functional.kl_div(
            lp, uniform, reduction="batchmean", log_target=True
        )
        main = (1 - label_smoothing) * ctc + label_smoothing * kl
    else:
        main = torch.sum(loss)
    total = (1.0 - interctc_weight) * main + interctc_weight * inter_loss
    return float(total)


class _FakeModel:
    """ModelAPI stand-in returning fixed log-probs."""

    def __init__(self, lp, ilp, out_lens):
        self._lp = jnp.asarray(lp)
        self._ilp = jnp.asarray(ilp)
        self._ol = jnp.asarray(out_lens)

    def forward(self, params, x, days, x_lens, *, train, key):
        return self._lp, self._ol, self._ilp


@pytest.mark.parametrize("label_smoothing", [0.0, 0.1])
def test_blended_loss_matches_torch_replica(label_smoothing):
    rng = np.random.default_rng(0)
    b, t, k, u = 4, 12, 7, 5
    logits = rng.standard_normal((b, t, k)).astype(np.float32)
    inter_logits = rng.standard_normal((b, t, k)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ilp = inter_logits - np.log(np.exp(inter_logits).sum(-1, keepdims=True))
    out_lens = np.full((b,), t, np.int32)
    y = rng.integers(1, k, size=(b, u)).astype(np.int32)
    y_lens = rng.integers(2, u + 1, size=b).astype(np.int32)
    for i in range(b):
        y[i, y_lens[i]:] = 0

    args = {
        "whiteNoiseSD": 0.0,
        "constantOffsetSD": 0.0,
        "nClasses": k - 1,
        "label_smoothing": label_smoothing,
        "interctc_weight": 0.3,
    }
    model = _FakeModel(lp, ilp, out_lens)
    x = jnp.zeros((b, 1, 1))
    loss, metrics = _loss_and_metrics(
        args, model, None,
        (x, jnp.asarray(y), jnp.asarray(out_lens), jnp.asarray(y_lens),
         jnp.zeros((b,), jnp.int32)),
        jax.random.key(0),
    )
    ref = _torch_reference_loss(
        lp, ilp, y, out_lens, y_lens, label_smoothing, 0.3, k
    )
    np.testing.assert_allclose(float(loss), ref, rtol=2e-4)


def test_conformer_bf16_compute_dtype_wired():
    args = {
        "model_type": "transformer_ctc",
        "nInputFeatures": 8,
        "nClasses": 6,
        "compute_dtype": "bfloat16",
        "temporal_kernel": 4,
        "temporal_stride": 2,
        "frontend_dim": 8,
        "latent_dim": 8,
        "autoencoder_hidden_dim": 8,
        "transformer_num_layers": 1,
        "transformer_n_heads": 2,
        "transformer_dim_ff": 8,
        "transformer_dropout": 0.0,
        "conformer_conv_kernel": 3,
        "use_spec_augment": False,
        "drop_path_prob": 0.0,
    }
    model = build_model(args, n_days=2)
    assert model.config.compute_dtype == jnp.bfloat16
    params = model.init(jax.random.key(0))
    lp, ol, _ = model.forward(
        params, jnp.zeros((2, 10, 8)), jnp.zeros((2,), jnp.int32),
        jnp.array([10, 8]), train=False, key=None,
    )
    assert lp.dtype == jnp.float32  # log-probs always f32
    assert np.isfinite(np.asarray(lp)).all()
