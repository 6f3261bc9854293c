"""Hardware-PRNG in-kernel dropout parity, on real TPU.

The compiled kernels generate dropout masks with the TPU hardware PRNG
re-seeded per (seed, program id) (``attention_kernel._keep_mask(hw=True)``,
``ffn_kernel._site_masks``); the backward kernels regenerate the same
bits in a *separate* ``pallas_call``. CPU/interpret tests cover only the
counter-hash branch, so this TPU-gated suite (run with
``NSD_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_dropout_prng.py``)
pins, on hardware:

  * the ``dropout_masks`` hooks reproduce exactly the masks the forward
    kernels applied (push the extracted masks through the pure-JAX
    reference and compare);
  * the custom-VJP backward applies the SAME masks (grad through the
    kernel == grad through the mask-explicit reference) — the property
    training gradients silently depend on;
  * the keep-rate matches the Bernoulli(1-rate) spec.

Skips cleanly when no TPU backend is available (CI on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real TPU backend required"
)

RATE = 0.3


def _seed_from(key):
    return jax.random.randint(
        key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    )


# ------------------------------------------------------------- attention


def _attn_case(b=4, h=2, t=64, dh=128, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, t, dh)) * 0.2, jnp.float32
    )
    q, k, v = mk(), mk(), mk()
    lens = jnp.asarray(rng.integers(t // 2, t + 1, size=b), jnp.int32)
    flat = lambda z: z.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    qkv = jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)
    return q, k, v, qkv, lens


def _masked_attn_reference(q, k, v, lens, keep, rate):
    """mhsa_reference with an explicit [B,H,Tp,Tp] keep mask applied to
    the probabilities (the kernels' dropout semantics)."""
    import math

    b, h, t, dh = q.shape
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    pad = jnp.arange(t)[None, :] >= lens[:, None]
    scores = jnp.where(pad[:, None, None, :], -1e9, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(
        jnp.max(scores, axis=-1, keepdims=True) <= -1e9, 0.0, probs
    )
    probs = jnp.where(keep, probs / (1 - rate), 0.0).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@pytest.mark.tpu
@requires_tpu
def test_attention_hw_masks_match_forward():
    from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
        _pad_t,
        dropout_masks,
        fused_mhsa_qkv,
    )

    q, k, v, qkv, lens = _attn_case()
    b, h, t, dh = q.shape
    key = jax.random.key(5)
    out = fused_mhsa_qkv(qkv, lens, key, num_heads=h, dropout_rate=RATE,
                         train=True)
    tp = _pad_t(t)
    keep = dropout_masks(b * h, tp, _seed_from(key), RATE)
    keep = keep.reshape(b, h, tp, tp)[:, :, :t, :t]
    ref = _masked_attn_reference(q, k, v, lens, keep, RATE)
    ref2d = ref.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    # f32 on the TPU MXU agrees to ~1e-3 across lowerings, not ulp
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref2d),
                               atol=2e-3)
    # keep-rate sanity over the valid region
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - RATE)) < 0.02


@pytest.mark.tpu
@requires_tpu
def test_attention_hw_backward_regenerates_forward_masks():
    from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
        _pad_t,
        dropout_masks,
        fused_mhsa_qkv,
    )

    q, k, v, qkv, lens = _attn_case(seed=1)
    b, h, t, dh = q.shape
    key = jax.random.key(9)
    tp = _pad_t(t)
    keep = dropout_masks(b * h, tp, _seed_from(key), RATE)
    keep = keep.reshape(b, h, tp, tp)[:, :, :t, :t]

    def split(qkv):
        parts = jnp.split(qkv, 3, axis=-1)
        return tuple(
            z.reshape(b, t, h, dh).transpose(0, 2, 1, 3) for z in parts
        )

    def loss_kernel(qkv):
        o = fused_mhsa_qkv(qkv, lens, key, num_heads=h, dropout_rate=RATE,
                           train=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_masked(qkv):
        o = _masked_attn_reference(*split(qkv), lens, keep, RATE)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss_kernel))(qkv)
    gr = jax.jit(jax.grad(loss_masked))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-3)


# ------------------------------------------------------------------ FFN


@pytest.mark.tpu
@requires_tpu
def test_ffn_hw_masks_match_forward_and_backward():
    from neural_speech_decoder_tpu.ops.pallas.ffn_kernel import (
        dropout_masks,
        fused_ffn,
    )

    b, t, d, f = 4, 64, 128, 256
    rng = np.random.default_rng(2)
    mk = lambda *shp: jnp.asarray(rng.standard_normal(shp) * 0.2,
                                  jnp.float32)
    x = mk(b, t, d)
    scale, bias = 1.0 + mk(d) * 0.1, mk(d) * 0.1
    w1, b1, w2, b2 = mk(d, f), mk(f) * 0.1, mk(f, d), mk(d) * 0.1
    key = jax.random.key(3)
    m1, m2 = dropout_masks(b, t, d, f, _seed_from(key), RATE)

    def masked_ref(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        hh = jax.nn.silu(xn @ w1 + b1)
        hh = jnp.where(m1, hh / (1 - RATE), 0.0)
        o = hh @ w2 + b2
        return jnp.where(m2, o / (1 - RATE), 0.0)

    out = fused_ffn(x, scale, bias, w1, b1, w2, b2, key,
                    dropout_rate=RATE, train=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(masked_ref(x)),
                               atol=2e-3)

    gk = jax.jit(jax.grad(lambda x: jnp.sum(
        fused_ffn(x, scale, bias, w1, b1, w2, b2, key,
                  dropout_rate=RATE, train=True).astype(jnp.float32) ** 2
    )))(x)
    gr = jax.jit(jax.grad(lambda x: jnp.sum(masked_ref(x) ** 2)))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-3)
