"""Hand-tiled Pallas projection matmul vs its XLA einsum twin.

The kernel (ops/pallas/matmul.py) carries the GRU layer-1+ input
projections — the torch reference's cuDNN-GRU input matmuls
(/root/reference/src/neural_decoder/model.py:75-81). These tests pin, in
interpret mode on CPU:

  * all three contraction layouts (nn / nt / tn) against jnp references,
    including zero-padded non-tiling row counts;
  * forward + full gradient parity of ``projection_matmul`` (bias fused
    into the epilogue) against the einsum + bias twin;
  * the end-to-end ``gru_forward`` with ``use_pallas_matmul=True`` against
    the default path, values and parameter gradients;
  * the shard_map multi-device path on the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neural_speech_decoder_tpu.models.gru import (
    GRUConfig,
    gru_forward,
    init_gru_params,
)
from neural_speech_decoder_tpu.ops.pallas.matmul import (
    projection_kernel_viable,
    projection_matmul,
    tiled_matmul,
)
from neural_speech_decoder_tpu.parallel.kernel_mesh import kernel_mesh


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


@pytest.mark.parametrize("m", [56, 128, 300])
def test_tiled_nn_matches_dot(m):
    rng = np.random.default_rng(0)
    a, b = _rand(rng, (m, 256)), _rand(rng, (256, 384), 0.1)
    got = tiled_matmul(a, b, kind="nn", interpret=True)
    np.testing.assert_allclose(got, a @ b, rtol=1e-5, atol=1e-5)


def test_tiled_nt_matches_dot():
    rng = np.random.default_rng(1)
    g, w = _rand(rng, (70, 384)), _rand(rng, (256, 384), 0.1)
    got = tiled_matmul(g, w, kind="nt", interpret=True)
    np.testing.assert_allclose(got, g @ w.T, rtol=1e-5, atol=1e-5)


def test_tiled_tn_matches_dot():
    rng = np.random.default_rng(2)
    x, g = _rand(rng, (70, 256)), _rand(rng, (70, 384), 0.1)
    got = tiled_matmul(x, g, kind="tn", interpret=True)
    np.testing.assert_allclose(got, x.T @ g, rtol=1e-5, atol=1e-5)


def test_tiled_rejects_untileable():
    rng = np.random.default_rng(3)
    a, b = _rand(rng, (64, 200)), _rand(rng, (200, 384))
    assert tiled_matmul(a, b, kind="nn", interpret=True) is None
    assert not projection_kernel_viable(64, 200, 384)
    assert projection_kernel_viable(64, 256, 384)


def test_tiled_rejects_mismatched_contraction():
    rng = np.random.default_rng(7)
    a, b = _rand(rng, (64, 256)), _rand(rng, (128, 384))
    with pytest.raises(ValueError, match="contracted dims disagree"):
        tiled_matmul(a, b, kind="nn", interpret=True)
    g, w = _rand(rng, (64, 384)), _rand(rng, (256, 512))
    with pytest.raises(ValueError, match="contracted dims disagree"):
        tiled_matmul(g, w, kind="nt", interpret=True)
    x, g2 = _rand(rng, (64, 256)), _rand(rng, (56, 384))
    with pytest.raises(ValueError, match="contracted dims disagree"):
        tiled_matmul(x, g2, kind="tn", interpret=True)


def test_forced_flag_falls_back_on_untileable_dims():
    # hidden=96 -> K = h*d = 192, not %128: a forced use_pallas_matmul=True
    # must warn and take the einsum twin, not raise inside the kernel.
    import neural_speech_decoder_tpu.models.gru as gru_mod

    cfg = GRUConfig(
        neural_dim=32, n_classes=12, hidden_dim=96, num_layers=2,
        n_days=2, dropout=0.0, use_pallas=False, use_pallas_matmul=True,
    )
    params = init_gru_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(8)
    x = _rand(rng, (4, 68, 32))
    day = jnp.asarray(rng.integers(0, 2, size=(4,)))
    gru_mod._warned_matmul_fallback = False
    with pytest.warns(UserWarning, match="not.*multiples of 128"):
        y = gru_forward(params, cfg, x, day)
    cfg_t = GRUConfig(**{**cfg.__dict__, "use_pallas_matmul": False})
    np.testing.assert_allclose(
        y, gru_forward(params, cfg_t, x, day), rtol=1e-5, atol=1e-5
    )


def test_projection_matmul_forward_and_grads_match_twin():
    rng = np.random.default_rng(4)
    x, w = _rand(rng, (56, 256)), _rand(rng, (256, 384), 0.1)
    bias = _rand(rng, (384,), 0.1)
    cot = _rand(rng, (56, 384))

    def twin(x, w, bias):
        y = jnp.einsum("mf,fk->mk", x, w, preferred_element_type=jnp.float32)
        return (y + bias).astype(x.dtype)

    y_k = projection_matmul(x, w, bias, True)
    y_t = twin(x, w, bias)
    np.testing.assert_allclose(y_k, y_t, rtol=1e-5, atol=1e-5)

    loss_k = lambda *a: jnp.sum(projection_matmul(*a, True) * cot)
    loss_t = lambda *a: jnp.sum(twin(*a) * cot)
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, bias)
    gt = jax.grad(loss_t, argnums=(0, 1, 2))(x, w, bias)
    for a, b in zip(gk, gt):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def _gru_case(use_mm, b=8, t=132, dtype=jnp.float32):
    cfg = GRUConfig(
        neural_dim=32, n_classes=12, hidden_dim=128, num_layers=3,
        n_days=3, dropout=0.0, use_pallas=False, use_pallas_matmul=use_mm,
        compute_dtype=dtype,
    )
    params = init_gru_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    x = _rand(rng, (b, t, 32))
    day = jnp.asarray(rng.integers(0, 3, size=(b,)))
    return cfg, params, x, day


def test_gru_forward_matches_default_path(monkeypatch):
    # On the 8-virtual-CPU conftest the kernel wrapper needs a registered
    # mesh whose batch axis covers all devices, or _projection_sharded
    # returns None and BOTH arms silently take the einsum twin (round-3
    # advisor finding: the comparison was vacuous). Register the mesh AND
    # count projection_matmul invocations to prove the kernel arm really
    # ran the kernel.
    import neural_speech_decoder_tpu.ops.pallas.matmul as mm

    calls = {"n": 0}
    real = mm.projection_matmul

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(mm, "projection_matmul", counting)

    cfg_k, params, x, day = _gru_case(True)
    cfg_t = GRUConfig(**{**cfg_k.__dict__, "use_pallas_matmul": False})
    n_dev = jax.device_count()
    mesh = Mesh(
        np.array(jax.devices()).reshape(n_dev, 1), ("data", "model")
    )
    assert x.shape[0] % n_dev == 0, "batch must split over the mesh"
    with kernel_mesh(mesh):
        y_k = gru_forward(params, cfg_k, x, day)
        assert calls["n"] > 0, "kernel path never exercised (vacuous test)"
        y_t = gru_forward(params, cfg_t, x, day)
    np.testing.assert_allclose(y_k, y_t, rtol=1e-5, atol=1e-5)

    def loss(cfg):
        return lambda p: jnp.sum(gru_forward(p, cfg, x, day) ** 2)

    with kernel_mesh(mesh):
        gk = jax.grad(loss(cfg_k))(params)
        gt = jax.grad(loss(cfg_t))(params)
    flat_k, _ = jax.tree_util.tree_flatten(gk)
    flat_t, _ = jax.tree_util.tree_flatten(gt)
    for a, b in zip(flat_k, flat_t):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs the virtual mesh")
def test_projection_shard_mapped_matches_single_device():
    from neural_speech_decoder_tpu.models.gru import _projection_sharded

    rng = np.random.default_rng(6)
    x3 = _rand(rng, (8, 17, 256))
    w = _rand(rng, (256, 384), 0.1)
    bias = _rand(rng, (384,), 0.1)
    cot = _rand(rng, (8, 17, 384))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))

    def loss(x3, w, bias):
        y = _projection_sharded(x3, w, bias)
        assert y is not None, "mesh should be batch-mappable"
        return jnp.sum(y * cot), y

    with kernel_mesh(mesh):
        (l_s, y_s), g_s = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True
        )(x3, w, bias)

    ref = jnp.einsum(
        "blf,fk->blk", x3, w, preferred_element_type=jnp.float32
    ) + bias
    np.testing.assert_allclose(y_s, ref, rtol=1e-5, atol=1e-5)
    ref_loss = lambda x3, w, bias: jnp.sum(
        (jnp.einsum("blf,fk->blk", x3, w,
                    preferred_element_type=jnp.float32) + bias) * cot
    )
    g_t = jax.grad(ref_loss, argnums=(0, 1, 2))(x3, w, bias)
    for a, b in zip(g_s, g_t):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
