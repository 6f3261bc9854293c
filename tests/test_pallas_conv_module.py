"""Fused conv-module kernel (ops/pallas/conv_module_kernel.py) vs its
pure-JAX oracle, in interpreter mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoder_tpu.models.conformer import (
    ConformerConfig,
    _conv_module,
    _init_conv_module,
)
from neural_speech_decoder_tpu.ops.pallas.conv_module_kernel import (
    conv_module_reference,
    fused_conv_module,
)

B, T, D, KW = 3, 24, 128, 5


@pytest.fixture(scope="module")
def setup():
    p = _init_conv_module(jax.random.key(0), D, KW, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (B, T, D), jnp.float32)
    return p, x


def _flat_args(p):
    return (p["ln"]["scale"], p["ln"]["bias"], p["pw1"]["w"], p["pw1"]["b"],
            p["dw_w"], p["dw_b"], p["ln_conv"]["scale"],
            p["ln_conv"]["bias"], p["pw2"]["w"], p["pw2"]["b"])


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_oracle(setup, causal):
    p, x = setup
    got = fused_conv_module(x, *_flat_args(p), None, causal=causal,
                            interpret=True)
    want = conv_module_reference(x, *_flat_args(p), causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_oracle_matches_module(setup):
    """The twin itself must match models/conformer.py::_conv_module
    (eval mode, residual subtracted)."""
    p, x = setup
    mod = _conv_module(p, x, None, 0.0, False)
    want = conv_module_reference(x, *_flat_args(p))
    np.testing.assert_allclose(np.asarray(mod - x), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_vjp_matches_oracle(setup, causal):
    p, x = setup

    def loss_kernel(x, *args):
        out = fused_conv_module(x, *args, None, causal=causal,
                                interpret=True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_ref(x, *args):
        out = conv_module_reference(x, *args, causal=causal)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gk = jax.grad(loss_kernel, argnums=tuple(range(11)))(x, *_flat_args(p))
    gr = jax.grad(loss_ref, argnums=tuple(range(11)))(x, *_flat_args(p))
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-4)


def test_dropout_deterministic_and_applied(setup):
    p, x = setup
    key = jax.random.key(7)
    o1 = fused_conv_module(x, *_flat_args(p), key, dropout_rate=0.4,
                           train=True, interpret=True)
    o2 = fused_conv_module(x, *_flat_args(p), key, dropout_rate=0.4,
                           train=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    zeros = np.mean(np.asarray(o1) == 0.0)
    assert 0.25 < zeros < 0.55  # ~rate of exact zeros from the mask
    # gradient flows and is finite with dropout on
    g = jax.grad(
        lambda xx: jnp.sum(
            fused_conv_module(xx, *_flat_args(p), key, dropout_rate=0.4,
                              train=True, interpret=True) ** 2
        )
    )(x)
    assert np.isfinite(np.asarray(g)).all()


def test_model_routes_through_fused_conv(setup):
    """fused_conv='force' produces the same eval forward as the default
    path at the model level."""
    from neural_speech_decoder_tpu.models.conformer import (
        conformer_forward,
        init_conformer_params,
    )

    cfg = ConformerConfig(
        n_channels=16, n_days=2, frontend_dim=32, latent_dim=D,
        autoencoder_hidden_dim=24, num_layers=2, num_heads=2, ff_dim=64,
        dropout=0.0, temporal_kernel=8, temporal_stride=4,
        conv_kernel=KW, use_spec_augment=False, drop_path_prob=0.0,
        head_dropout=0.0,
    )
    params = init_conformer_params(jax.random.key(2), cfg=cfg)
    x = jax.random.normal(jax.random.key(3), (2, 64, 16), jnp.float32)
    lens = jnp.array([64, 48])
    base, l0, _ = conformer_forward(params, cfg, x, jnp.array([0, 1]), lens,
                                    train=False, key=None)
    fcfg = dataclasses.replace(cfg, fused_conv="force")
    fused, l1, _ = conformer_forward(params, fcfg, x, jnp.array([0, 1]),
                                     lens, train=False, key=None)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(base), np.asarray(fused),
                               atol=2e-5, rtol=1e-5)
