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
def test_fused_attention_parity_real_shape():
    """Fused Pallas MHSA vs the naive einsum path at production shape
    (B=64 would OOM nothing but takes a while; B=16, T'=313, D=1024, H=8
    exercises the same tile geometry), bf16, fwd + grads."""
    from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
        fused_mhsa,
        mhsa_reference,
    )

    b, h, t, dh = 16, 8, 313, 128
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.bfloat16)
        for _ in range(3)
    )
    lens = jnp.asarray(rng.integers(64, t + 1, size=(b,)), jnp.int32)

    out = np.asarray(
        jax.jit(lambda q, k, v: fused_mhsa(q, k, v, lens, None))(q, k, v)
    ).astype(np.float32)
    ref = np.asarray(
        jax.jit(lambda q, k, v: mhsa_reference(q, k, v, lens))(q, k, v)
    ).astype(np.float32)
    assert float(np.max(np.abs(out - ref))) < 0.05  # bf16 rounding
    np.testing.assert_allclose(out, ref, atol=0.05)

    def loss(fn):
        return jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2),
        ))

    g_out = loss(lambda q, k, v: fused_mhsa(q, k, v, lens, None))(q, k, v)
    g_ref = loss(lambda q, k, v: mhsa_reference(q, k, v, lens))(q, k, v)
    for a, b_ in zip(g_out, g_ref):
        a = np.asarray(a).astype(np.float32)
        b_ = np.asarray(b_).astype(np.float32)
        scale = max(float(np.max(np.abs(b_))), 1e-3)
        np.testing.assert_allclose(a, b_, atol=0.02 * scale)


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
