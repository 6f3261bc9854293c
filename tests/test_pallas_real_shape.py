"""Pallas-vs-lax.scan parity at PRODUCTION tile shapes, on real TPU.

The Pallas GRU kernel only engages when ``hidden % 128 == 0 and
batch % 16 == 0`` (``models/gru.py``), so the CPU interpret-mode tests never
exercise the exact production path. This TPU-gated suite (run with
``NSD_TEST_PLATFORM=tpu python -m pytest tests/test_pallas_real_shape.py``)
pins logits AND gradients of the Pallas kernel against the pure-JAX
custom-VJP scan at the reference shape: H=1024, B=64, bidirectional.

Skips cleanly when no TPU backend is available (CI on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.gru import GRUConfig, gru_forward, init_gru_params

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real TPU backend required"
)

B, H, T = 64, 1024, 512  # L = (512-32)//4 + 1 = 121 scan steps


def _full_cfg(**kw):
    return GRUConfig(
        neural_dim=256, n_classes=40, hidden_dim=H, num_layers=5, n_days=24,
        dropout=0.0, stride_len=4, kernel_len=32, gaussian_smooth_width=2.0,
        bidirectional=True, **kw,
    )


def _inputs(rng):
    x = jnp.asarray(rng.standard_normal((B, T, 256)), jnp.float32)
    day = jnp.asarray(rng.integers(0, 24, size=(B,)), jnp.int32)
    return x, day


@pytest.mark.tpu
@requires_tpu
def test_pallas_forward_parity_f32_real_shape():
    cfg_scan = _full_cfg(use_pallas=False)
    cfg_pallas = _full_cfg(use_pallas=True)
    params = init_gru_params(jax.random.key(0), cfg_scan)
    x, day = _inputs(np.random.default_rng(0))
    ref = np.asarray(jax.jit(
        lambda p, x, d: gru_forward(p, cfg_scan, x, d, train=False)
    )(params, x, day))
    got = np.asarray(jax.jit(
        lambda p, x, d: gru_forward(p, cfg_pallas, x, d, train=False)
    )(params, x, day))
    assert got.shape == ref.shape == (B, (T - 32) // 4 + 1, 41)
    # TPU f32 matmuls lower through the MXU with pass-dependent internal
    # precision (bf16x3/x6), so the two code paths agree to ~1e-3, not ulp.
    np.testing.assert_allclose(got, ref, atol=2e-3)


@pytest.mark.tpu
@requires_tpu
def test_pallas_grad_parity_f32_real_shape():
    cfg_scan = _full_cfg(use_pallas=False)
    cfg_pallas = _full_cfg(use_pallas=True)
    params = init_gru_params(jax.random.key(1), cfg_scan)
    x, day = _inputs(np.random.default_rng(1))

    def loss(cfg):
        # train=True = the path actually differentiated in production (the
        # fused inference frontend kernel is forward-only); dropout is 0.
        def f(p):
            logits = gru_forward(
                p, cfg, x, day, train=True, dropout_key=jax.random.key(0)
            )
            return jnp.mean(jax.nn.log_softmax(logits, -1) ** 2)
        return jax.jit(jax.grad(f))

    g_ref = loss(cfg_scan)(params)
    g_pal = loss(cfg_pallas)(params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pal = jax.tree.leaves(g_pal)
    assert len(flat_ref) == len(flat_pal)
    for a, b in zip(flat_ref, flat_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.max(np.abs(a)))
        # Relative to each leaf's grad magnitude, floored at 1e-6 absolute
        # (near-zero-grad leaves otherwise amplify MXU rounding noise).
        np.testing.assert_allclose(b, a, atol=max(2e-3 * scale, 1e-6))


@pytest.mark.tpu
@requires_tpu
def test_pallas_bf16_tracks_f32_real_shape():
    """The bf16 production path must stay within bf16 rounding of the f32
    oracle (catches carry-precision regressions in the kernel)."""
    cfg_f32 = _full_cfg(use_pallas=True)
    cfg_bf16 = _full_cfg(use_pallas=True, compute_dtype=jnp.bfloat16)
    params = init_gru_params(jax.random.key(2), cfg_f32)
    x, day = _inputs(np.random.default_rng(2))
    ref = np.asarray(jax.jit(
        lambda p, x, d: gru_forward(p, cfg_f32, x, d, train=False)
    )(params, x, day))
    got = np.asarray(jax.jit(
        lambda p, x, d: gru_forward(p, cfg_bf16, x, d, train=False)
    )(params, x, day))
    # Logits are O(1); bf16 matmuls with f32 accumulation over 5 layers.
    assert float(np.max(np.abs(got - ref))) < 0.15
    assert float(np.mean(np.abs(got - ref))) < 0.02
