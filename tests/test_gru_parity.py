"""End-to-end logit parity: JAX GRU decoder vs reference torch GRUDecoder.

Loads reference-initialized torch weights into the JAX parameter pytree and
compares full-model logits on fixed inputs (SURVEY.md §4(d)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.gru import (
    GRUConfig,
    gru_forward,
    init_gru_params,
)

from _torch_ref import torch_gru_decoder


def torch_to_pytree(model, cfg: GRUConfig):
    """Convert reference GRUDecoder state via the package migration path."""
    from neural_speech_decoder_tpu.models.torch_import import (
        import_gru_state_dict,
    )

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return import_gru_state_dict(sd, cfg)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_full_model_logit_parity(bidirectional):
    import torch

    cfg = GRUConfig(
        neural_dim=16,
        n_classes=6,
        hidden_dim=12,
        num_layers=3,
        n_days=4,
        dropout=0.0,
        stride_len=4,
        kernel_len=8,
        gaussian_smooth_width=2.0,
        bidirectional=bidirectional,
    )
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
        bidirectional=bidirectional,
    )
    model.eval()
    # Perturb day weights/bias so the day layer is exercised non-trivially.
    with torch.no_grad():
        model.dayWeights.add_(torch.randn_like(model.dayWeights) * 0.1)
        model.dayBias.add_(torch.randn_like(model.dayBias) * 0.1)

    rng = np.random.default_rng(7)
    b, t = 3, 40
    x = rng.standard_normal((b, t, cfg.neural_dim)).astype(np.float32)
    day = np.array([0, 2, 3], dtype=np.int64)

    with torch.no_grad():
        ref = model(torch.from_numpy(x), torch.from_numpy(day)).numpy()

    params = torch_to_pytree(model, cfg)
    ours = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray(day), train=False)
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_init_shapes_and_identity_day_layer():
    cfg = GRUConfig(
        neural_dim=8, n_classes=5, hidden_dim=16, num_layers=2, n_days=3,
        kernel_len=4, stride_len=2, bidirectional=True,
    )
    params = init_gru_params(jax.random.key(0), cfg)
    np.testing.assert_allclose(
        np.asarray(params["day"]["weight"][1]), np.eye(8), atol=0
    )
    assert params["gru"]["layers"][0]["w_ih"].shape == (2, 8 * 4, 48)
    assert params["gru"]["layers"][1]["w_ih"].shape == (2, 32, 48)
    # Orthogonality of recurrent weights: W^T W = I on the [3H,H] matrix.
    w = np.asarray(params["gru"]["layers"][0]["w_hh"][0]).T  # [3H, H]
    np.testing.assert_allclose(w.T @ w, np.eye(16), atol=1e-5)


def test_dropout_train_mode_changes_output():
    cfg = GRUConfig(
        neural_dim=8, n_classes=5, hidden_dim=16, num_layers=2, n_days=3,
        kernel_len=4, stride_len=2, dropout=0.5, bidirectional=False,
    )
    params = init_gru_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 20, 8))
    day = jnp.array([0, 1])
    y_eval = gru_forward(params, cfg, x, day, train=False)
    y_tr1 = gru_forward(params, cfg, x, day, train=True,
                        dropout_key=jax.random.key(2))
    y_tr2 = gru_forward(params, cfg, x, day, train=True,
                        dropout_key=jax.random.key(3))
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_tr1))
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_tr2))
