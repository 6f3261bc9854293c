"""Fused FFN Pallas kernel vs pure-JAX oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoder_tpu.ops.pallas.ffn_kernel import (
    dropout_masks,
    ffn_reference,
    fused_ffn,
)


def make_case(b=3, t=17, d=32, f=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda *shp: jnp.asarray(rng.standard_normal(shp) * 0.3, dtype)
    x = mk(b, t, d)
    params = dict(
        scale=1.0 + mk(d) * 0.1,
        bias=mk(d) * 0.1,
        w1=mk(d, f),
        b1=mk(f) * 0.1,
        w2=mk(f, d),
        b2=mk(d) * 0.1,
    )
    return x, params


def _ref(x, p):
    return ffn_reference(x, p["scale"], p["bias"], p["w1"], p["b1"],
                         p["w2"], p["b2"])


def _kern(x, p, key=None, rate=0.0, train=False):
    return fused_ffn(x, p["scale"], p["bias"], p["w1"], p["b1"], p["w2"],
                     p["b2"], key, dropout_rate=rate, train=train,
                     interpret=True)


def test_fwd_matches_oracle():
    x, p = make_case()
    np.testing.assert_allclose(
        np.asarray(_kern(x, p)), np.asarray(_ref(x, p)),
        rtol=1e-6, atol=1e-6,
    )


def test_fwd_matches_ff_module():
    """The oracle itself (and hence the kernel) matches the model's
    _ff_module with dropout off."""
    from neural_speech_decoder_tpu.models.conformer import _ff_module

    x, p = make_case(seed=3)
    mp = {
        "ln": {"scale": p["scale"], "bias": p["bias"]},
        "lin1": {"w": p["w1"], "b": p["b1"]},
        "lin2": {"w": p["w2"], "b": p["b2"]},
    }
    ref = _ff_module(mp, x, None, 0.3, False)
    # rtol 1e-4: einsum vs dot_general lowerings reassociate FMAs
    # differently on CPU; the kernel is bit-tight against ffn_reference
    # (test above), which is the pinned contract.
    np.testing.assert_allclose(
        np.asarray(_kern(x, p)), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_grads_match_oracle():
    x, p = make_case(seed=1)

    def loss_k(x, p):
        return jnp.sum(_kern(x, p) ** 2)

    def loss_r(x, p):
        return jnp.sum(_ref(x, p) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, p)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, p)
    # rtol 2e-3 / atol 1e-4: the hand-written VJP reassociates the f32
    # reductions differently from autodiff through the oracle; violations
    # are ~6e-5 absolute on O(100) gradients (cancellation on
    # small-magnitude elements). Formula errors would be O(1).
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=2e-3, atol=1e-4)
    for name in gr[1]:
        np.testing.assert_allclose(
            np.asarray(gk[1][name]), np.asarray(gr[1][name]),
            rtol=2e-3, atol=1e-4, err_msg=name,
        )


def test_dropout_fwd_matches_oracle_with_extracted_masks():
    """Exact parity under dropout: rebuild the kernel's keep-masks via the
    test hook and push them through the reference computation."""
    b, t, d, f = 2, 9, 16, 32
    x, p = make_case(b=b, t=t, d=d, f=f, seed=2)
    rate = 0.4
    key = jax.random.key(7)
    out = _kern(x, p, key, rate=rate, train=True)

    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    m1, m2 = dropout_masks(b, t, d, f, seed, rate, interpret=True)

    # reference with the same masks
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    h = jax.nn.silu(xn @ p["w1"] + p["b1"])
    h = jnp.where(m1, h / (1 - rate), 0.0)
    o = h @ p["w2"] + p["b2"]
    o = jnp.where(m2, o / (1 - rate), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(o),
                               rtol=1e-5, atol=1e-5)


def test_dropout_grad_consistent_with_masks():
    """The VJP regenerates the same masks as the forward: grad through the
    kernel == grad through the mask-explicit reference."""
    b, t, d, f = 2, 7, 16, 32
    x, p = make_case(b=b, t=t, d=d, f=f, seed=4)
    rate = 0.3
    key = jax.random.key(11)
    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    m1, m2 = dropout_masks(b, t, d, f, seed, rate, interpret=True)

    def loss_k(x):
        return jnp.sum(_kern(x, p, key, rate=rate, train=True) ** 2)

    def loss_m(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
        h = jax.nn.silu(xn @ p["w1"] + p["b1"])
        h = jnp.where(m1, h / (1 - rate), 0.0)
        o = h @ p["w2"] + p["b2"]
        return jnp.sum(jnp.where(m2, o / (1 - rate), 0.0) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_k)(x)), np.asarray(jax.grad(loss_m)(x)),
        rtol=1e-5, atol=1e-5,
    )


def test_mask_sites_independent():
    seed = jnp.zeros((1,), jnp.int32)
    m1, m2 = dropout_masks(2, 8, 16, 16, seed, 0.5, interpret=True)
    # same shape here by construction — sites must still draw different bits
    assert not bool(jnp.all(m1 == m2))


def test_jit_under_vmapless_batch():
    x, p = make_case(b=5, t=11, d=16, f=32, seed=5)
    out = jax.jit(lambda x: _kern(x, p))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, p)),
                               rtol=1e-6, atol=1e-6)


def test_model_forward_force_matches_einsum_path():
    """conformer_forward with fused_ffn='force' (kernel in interpret mode)
    matches the einsum twin end-to-end, eval mode.

    Under the 8-virtual-device conftest a kernel mesh must be registered
    (and the batch must split over it) or _fused_ffn_sharded returns None
    and this test would silently compare the twin to itself — so the
    fused run asserts the kernel path was actually mappable."""
    from jax.sharding import Mesh

    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        _use_fused_ffn,
        conformer_forward,
        init_conformer_params,
    )
    from neural_speech_decoder_tpu.parallel.kernel_mesh import (
        batch_mappable_mesh,
        kernel_mesh,
    )

    base = dict(
        n_channels=16, n_classes=6, n_days=3, frontend_dim=128,
        latent_dim=128, autoencoder_hidden_dim=32, num_layers=2,
        num_heads=2, ff_dim=256, temporal_kernel=8, temporal_stride=2,
        fused_attention=False,
    )
    cfg_twin = ConformerConfig(**base, fused_ffn=False)
    cfg_kern = ConformerConfig(**base, fused_ffn="force")
    params = init_conformer_params(jax.random.key(0), cfg=cfg_twin)
    b = jax.device_count()  # 8 under conftest: splits over the mesh
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 40, 16)), jnp.float32)
    days = jnp.asarray(rng.integers(0, 3, size=b), jnp.int32)
    lens = jnp.asarray(rng.integers(25, 41, size=b), jnp.int32)
    lp_t, ol_t, _ = conformer_forward(params, cfg_twin, x, days, lens)
    mesh = Mesh(
        np.array(jax.devices()).reshape(jax.device_count(), 1),
        ("data", "model"),
    )
    with kernel_mesh(mesh):
        assert _use_fused_ffn(cfg_kern, 40, b)
        if jax.device_count() > 1:  # gate actually maps on this mesh
            assert batch_mappable_mesh(b) is not None
        lp_k, ol_k, _ = conformer_forward(params, cfg_kern, x, days, lens)
    np.testing.assert_array_equal(np.asarray(ol_t), np.asarray(ol_k))
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_t),
                               rtol=1e-4, atol=1e-5)


def test_bf16_dropout_dw2_operand_bit_parity():
    """In bf16, the backward's dW2 must be BIT-identical to the dot of
    the forward's exact w2 operand with the (kernel-rounded) cotangent.
    The forward computes `h * inv` as a bf16 multiply by the bf16-rounded
    inverse-keep constant (a python-float scalar stays weak-typed); an
    f32 multiply by the full-precision constant in the backward rounds
    ~13% of operand elements differently (regression: 320/2048 dW2
    entries differed pre-fix). The VJP's returned grad is rounded to the
    weight dtype (custom_vjp contract), so the reference rounds too."""
    b, t, d, f = 2, 16, 32, 64
    x, p = make_case(b=b, t=t, d=d, f=f, seed=7, dtype=jnp.bfloat16)
    rate = 0.3  # 1/(1-rate) is not bf16-representable
    key = jax.random.key(3)
    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    m1, m2 = dropout_masks(b, t, d, f, seed, rate, interpret=True)
    inv = 1.0 / (1 - rate)

    y, vjp = jax.vjp(
        lambda w2: _kern(x, dict(p, w2=w2), key, rate=rate, train=True),
        p["w2"],
    )
    ct = jnp.ones_like(y)  # unit cotangent: dW2 depends only on hq and m2
    gk = vjp(ct)[0]

    # the forward kernel's exact w2-operand chain (bit-parity pinned by
    # test_dropout_fwd_matches_oracle_with_extracted_masks for f32; the
    # forward itself was verified bit-exact against this chain in bf16)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
          * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32))
    s = jnp.einsum(
        "btd,df->btf", xn.astype(jnp.bfloat16), p["w1"],
        preferred_element_type=jnp.float32,
    ) + p["b1"].astype(jnp.float32)
    sb = s.astype(jnp.bfloat16).astype(jnp.float32)
    hq = (sb * jax.nn.sigmoid(sb)).astype(jnp.bfloat16)
    hq = jnp.where(m1, hq * inv, 0.0).astype(jnp.bfloat16)  # bf16 multiply

    g = jnp.where(m2, ct.astype(jnp.float32) * inv, 0.0).astype(
        jnp.bfloat16
    )  # output-dropout scaled, rounded to cdt for the MXU dot
    dw2_ref = jnp.einsum(
        "btf,btd->fd", hq, g, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(dw2_ref))
