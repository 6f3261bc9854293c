"""shard_map-wrapped Pallas kernel paths on the 8-virtual-device CPU mesh.

Mosaic custom calls have no GSPMD partitioning rule, so multi-device runs
route the Pallas kernels through fully-manual ``shard_map`` regions
(parallel/kernel_mesh.py). These tests pin, per kernel, that the wrapped
call matches its XLA twin in BOTH forward values and gradients — the
gradient side is the risky one: weights enter the manual region unmapped
(``P()``) and rely on shard_map's transpose psum, which is only correct
because the wrap is gated to meshes whose mapped axes cover all devices.

Reference behavior being scaled out: the torch trainer's single-GPU GRU
step (/root/reference/src/neural_decoder/neural_decoder_trainer.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neural_speech_decoder_tpu.parallel.kernel_mesh import (
    kernel_batch_shards,
    kernel_mesh,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs the 8-virtual-device CPU mesh"
)


def _data_mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]).reshape(n, 1), ("data", "model"))


def _tp_mesh():
    return Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))


# ---------------------------------------------------------------- GRU scan


def _gru_case(seed=0, l=5, d=2, b=64, h=128):
    # b=64 over the 4-shard data mesh = 16 rows/shard — the scan kernel's
    # per-SHARD batch tile now enforced by batch_shard_mapped(tile=16)
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((l, d, b, 3 * h)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, h, 3 * h)).astype(np.float32) * 0.2)
    bb = jnp.asarray(rng.standard_normal((d, 3 * h)).astype(np.float32) * 0.1)
    return xp, w, bb


def _flip_d1(x):
    if x.shape[1] == 2:
        return x.at[:, 1].set(jnp.flip(x[:, 1], axis=0))
    return x


def test_gru_scan_sharded_matches_oracle():
    from neural_speech_decoder_tpu.models.gru import (
        _gru_layer,
        _gru_sequence_sharded,
    )

    xp, w, bb = _gru_case()
    h0 = jnp.zeros((2, xp.shape[2], w.shape[1]), xp.dtype)
    ref = _flip_d1(_gru_layer(_flip_d1(xp), w, bb, h0))
    cot = jnp.asarray(
        np.random.default_rng(1).standard_normal(ref.shape).astype(np.float32)
    )

    def loss_ref(xp, w, bb):
        return jnp.sum(_flip_d1(_gru_layer(_flip_d1(xp), w, bb, h0)) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, w, bb)
    with kernel_mesh(_data_mesh()):
        out = _gru_sequence_sharded(xp, w, bb)
        g = jax.grad(
            lambda xp, w, bb: jnp.sum(_gru_sequence_sharded(xp, w, bb) * cot),
            argnums=(0, 1, 2),
        )(xp, w, bb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # w/bb grads are the unmapped-input psum path — the part full-manual
    # check_vma=False gets wrong if compute were replicated on any axis.
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_gru_scan_falls_back_off_mesh():
    """On a TP mesh (model axis > 1) the batch-only kernels must gate off."""
    with kernel_mesh(_tp_mesh()):
        assert kernel_batch_shards(32, tile=16) is None
    with kernel_mesh(_data_mesh()):
        assert kernel_batch_shards(32, tile=8) == 4
        assert kernel_batch_shards(30, tile=8) is None  # uneven split
    assert kernel_batch_shards(32, tile=8) is None  # no mesh registered
    assert kernel_batch_shards(32, tile=8, n_devices=1) == 1


def test_forced_kernels_route_to_xla_twin_on_unmappable_mesh():
    """Forced kernel flags on a mesh the wrappers can't map (TP mesh for
    batch-only kernels, or none registered) must fall back to the XLA
    twins — NOT run the bare kernel, which GSPMD would all-gather and
    replicate on every chip."""
    from neural_speech_decoder_tpu.models.gru import (
        _fused_frontend_sharded,
        _gru_sequence_sharded,
    )
    from neural_speech_decoder_tpu.ops.ctc import _ctc_kernel_sharded, ctc_loss

    xp, w, bb = _gru_case(b=8)
    with kernel_mesh(_tp_mesh()):
        assert _gru_sequence_sharded(xp, w, bb) is None
        assert (
            _fused_frontend_sharded(
                jnp.zeros((8, 20, 128)), jnp.zeros((2, 128, 128)),
                jnp.zeros((2, 128)), jnp.zeros((8,), jnp.int32),
                kernel_size=20, sigma=2.0,
            )
            is None
        )
        assert (
            _ctc_kernel_sharded(
                jnp.zeros((8, 12, 5)), jnp.full((8,), 12, jnp.int32),
                jnp.ones((8, 3), jnp.int32), jnp.full((8,), 3, jnp.int32),
            )
            is None
        )
        # ctc_loss(use_kernel=True) transparently lands on the optax path
        rng = np.random.default_rng(5)
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((8, 12, 5)).astype(np.float32))
        )
        il = jnp.full((8,), 12, jnp.int32)
        lab = jnp.asarray(rng.integers(1, 5, (8, 3)), jnp.int32)
        ll = jnp.full((8,), 3, jnp.int32)
        forced = ctc_loss(lp, il, lab, ll, reduction="none", use_kernel=True)
        optax_ref = ctc_loss(lp, il, lab, ll, reduction="none",
                             use_kernel=False)
        np.testing.assert_allclose(
            np.asarray(forced), np.asarray(optax_ref), atol=1e-6
        )
    # no mesh registered at all: same story
    assert _gru_sequence_sharded(xp, w, bb) is None


def test_pallas_gate_warns_on_multidevice_fallback(monkeypatch):
    """A multi-device TPU run that loses the kernel path (no mappable
    mesh) must warn, just like a single-chip tile misalignment."""
    import neural_speech_decoder_tpu.models.gru as gm

    monkeypatch.setattr(gm, "_warned_pallas_fallback", False)
    with pytest.warns(UserWarning, match="kernel mesh"):
        assert (
            gm._pallas_scan_gate("tpu", 1024, 64, jax.device_count())
            is False
        )


# ------------------------------------------------------------ CTC kernel


def test_ctc_kernel_sharded_matches_optax():
    from neural_speech_decoder_tpu.ops.ctc import ctc_loss

    rng = np.random.default_rng(2)
    # b=32 over the 4-shard mesh = 8 rows/shard (the CTC kernel's
    # per-shard tile); an undersized batch would now silently fall back
    # to optax and this test would compare optax to itself
    b, t, u, k = 32, 24, 6, 12
    logits = jnp.asarray(rng.standard_normal((b, t, k)).astype(np.float32))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    in_lens = jnp.asarray(rng.integers(u + 3, t + 1, size=b), jnp.int32)
    labels = jnp.asarray(rng.integers(1, k, size=(b, u)), jnp.int32)
    lab_lens = jnp.asarray(rng.integers(1, u + 1, size=b), jnp.int32)

    args = (log_probs, in_lens, labels, lab_lens)
    ref = ctc_loss(*args, reduction="none", use_kernel=False)
    g_ref = jax.grad(
        lambda lp: jnp.sum(ctc_loss(lp, *args[1:], reduction="none",
                                    use_kernel=False))
    )(log_probs)
    with kernel_mesh(_data_mesh()):
        assert kernel_batch_shards(b, tile=8) == 4  # kernel path is live
        ours = ctc_loss(*args, reduction="none", use_kernel=True)
        # jit matches production (the trainer's loss runs inside the
        # jitted step); EAGER grad-of-shard_map trips a JAX 0.9
        # linearization bug on this kernel's int-typed residual
        # forwarding ("Unexpected XLA sharding override" assert).
        g = jax.jit(jax.grad(
            lambda lp: jnp.sum(ctc_loss(lp, *args[1:], reduction="none",
                                        use_kernel=True))
        ))(log_probs)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


# ------------------------------------------------------- fused attention


def _attn_case(seed=3, b=4, h=4, t=64, dh=128):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, t, dh)).astype(np.float32) * 0.1
    )
    lens = jnp.asarray(rng.integers(t // 2, t + 1, size=b), jnp.int32)
    return mk(), mk(), mk(), lens


@pytest.mark.parametrize("head_tp", [False, True])
def test_fused_attention_sharded_matches_reference(head_tp):
    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        _fused_mhsa_sharded,
        _use_fused_attention,
    )
    from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
        mhsa_reference,
    )

    cfg = ConformerConfig(
        latent_dim=512,
        num_heads=4,
        qkv_interleaved=head_tp,
        fused_attention="force",
    )
    q, k, v, lens = _attn_case()
    b, h, t, dh = q.shape
    mesh = _tp_mesh() if head_tp else _data_mesh()

    def flat(z):  # [B,H,T,dh] -> head-major [B,T,H*dh]
        return z.transpose(0, 2, 1, 3).reshape(b, t, h * dh)

    if head_tp:  # (head, {q,k,v}, dh) column order
        qkv = jnp.stack(
            [flat(z).reshape(b, t, h, dh) for z in (q, k, v)], axis=3
        ).reshape(b, t, 3 * h * dh)

        def split(qkv):
            z = qkv.reshape(b, t, h, 3, dh)
            return tuple(
                z[:, :, :, i].transpose(0, 2, 1, 3) for i in range(3)
            )
    else:  # torch-canonical ({q,k,v}, head, dh)
        qkv = jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)

        def split(qkv):
            parts = jnp.split(qkv, 3, axis=-1)
            return tuple(
                z.reshape(b, t, h, dh).transpose(0, 2, 1, 3) for z in parts
            )

    ref = flat(mhsa_reference(q, k, v, lens))
    g_ref = jax.grad(
        lambda qkv: jnp.sum(mhsa_reference(*split(qkv), lens) ** 2)
    )(qkv)
    with kernel_mesh(mesh):
        assert _use_fused_attention(cfg, t, b)
        out = _fused_mhsa_sharded(
            cfg, qkv, lens, None, dropout_rate=0.0, train=False
        )
        g = jax.grad(
            lambda qkv: jnp.sum(
                _fused_mhsa_sharded(
                    cfg, qkv, lens, None, dropout_rate=0.0, train=False
                )
                ** 2
            )
        )(qkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_fused_attention_gate_multichip():
    """Auto-gate: head-replicated configs need a batch-only mesh; the
    interleaved TP layout accepts batch x model when heads split evenly."""
    import neural_speech_decoder_tpu.models.conformer as cm

    bf16 = dict(compute_dtype=jnp.bfloat16)
    cfg_rep = cm.ConformerConfig(latent_dim=512, num_heads=4, **bf16)
    cfg_tp = cm.ConformerConfig(
        latent_dim=512, num_heads=4, qkv_interleaved=True, **bf16
    )
    # pretend we're on TPU so only the mesh logic is under test
    real_backend = cm.jax.default_backend
    cm.jax.default_backend = lambda: "tpu"
    try:
        with kernel_mesh(_tp_mesh()):
            assert cm._use_fused_attention(cfg_rep, 64, 4) is False
            assert cm._use_fused_attention(cfg_tp, 64, 4) is True
            # heads must split evenly over the model axis
            cfg_odd = cm.ConformerConfig(
                latent_dim=384, num_heads=3, qkv_interleaved=True, **bf16
            )
            assert cm._use_fused_attention(cfg_odd, 64, 4) is False
        with kernel_mesh(_data_mesh()):
            assert cm._use_fused_attention(cfg_rep, 64, 4) is True
            # batch must split evenly over the data axis
            assert cm._use_fused_attention(cfg_rep, 64, 6) is False
        assert cm._use_fused_attention(cfg_rep, 64, 4) is False  # no mesh
    finally:
        cm.jax.default_backend = real_backend


# ------------------------------------------------------ frontend kernel


def test_frontend_kernel_sharded_matches_single():
    from neural_speech_decoder_tpu.models.gru import _fused_frontend_sharded
    from neural_speech_decoder_tpu.ops.pallas.frontend_kernel import (
        fused_frontend,
    )

    rng = np.random.default_rng(4)
    b, t, c, days = 8, 40, 128, 3
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = jnp.asarray(
        np.stack([np.eye(c, dtype=np.float32) for _ in range(days)])
        + rng.standard_normal((days, c, c)).astype(np.float32) * 0.02
    )
    bias = jnp.asarray(rng.standard_normal((days, c)).astype(np.float32) * 0.1)
    idx = jnp.asarray(rng.integers(0, days, size=b), jnp.int32)

    ref = fused_frontend(x, w, bias, idx, kernel_size=20, sigma=2.0,
                         interpret=True)
    with kernel_mesh(_data_mesh()):
        out = _fused_frontend_sharded(x, w, bias, idx, kernel_size=20,
                                      sigma=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ------------------------------------------------------------- fused FFN


def test_fused_ffn_sharded_matches_reference():
    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        _fused_ffn_sharded,
        _use_fused_ffn,
    )
    from neural_speech_decoder_tpu.ops.pallas.ffn_kernel import (
        ffn_reference,
    )

    cfg = ConformerConfig(latent_dim=128, ff_dim=256, fused_ffn="force")
    rng = np.random.default_rng(9)
    b, t, d, f = 8, 24, 128, 256
    mk = lambda *shp: jnp.asarray(rng.standard_normal(shp) * 0.2,
                                  jnp.float32)
    x = mk(b, t, d)
    p = {
        "ln": {"scale": 1.0 + mk(d) * 0.1, "bias": mk(d) * 0.1},
        "lin1": {"w": mk(d, f), "b": mk(f) * 0.1},
        "lin2": {"w": mk(f, d), "b": mk(d) * 0.1},
    }
    ref = ffn_reference(x, p["ln"]["scale"], p["ln"]["bias"],
                        p["lin1"]["w"], p["lin1"]["b"],
                        p["lin2"]["w"], p["lin2"]["b"])

    def loss(fn, x, p):
        return jnp.sum(fn(x, p) ** 2)

    def ref_fn(x, p):
        return ffn_reference(x, p["ln"]["scale"], p["ln"]["bias"],
                             p["lin1"]["w"], p["lin1"]["b"],
                             p["lin2"]["w"], p["lin2"]["b"])

    g_ref = jax.grad(lambda p: loss(ref_fn, x, p))(p)
    with kernel_mesh(_data_mesh()):
        assert _use_fused_ffn(cfg, t, b)
        out = _fused_ffn_sharded(cfg, p, x, None, dropout_rate=0.0,
                                 train=False)
        # weight grads must psum correctly over the manual batch axis
        g = jax.jit(jax.grad(
            lambda p: loss(
                lambda x, p: _fused_ffn_sharded(
                    cfg, p, x, None, dropout_rate=0.0, train=False
                ), x, p,
            )
        ))(p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
    for path in ("ln", "lin1", "lin2"):
        for leaf in g[path]:
            np.testing.assert_allclose(
                np.asarray(g[path][leaf]), np.asarray(g_ref[path][leaf]),
                rtol=2e-3, atol=1e-4, err_msg=f"{path}/{leaf}",
            )
