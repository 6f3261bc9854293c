"""Fused MHSA Pallas kernel vs pure-JAX oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
    _pad_t,
    dropout_masks,
    fused_mhsa,
    mhsa_reference,
)


def make_qkv(b=2, h=2, t=37, dh=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, t, dh)), dtype=dtype
    )
    return mk(), mk(), mk()


def test_fwd_matches_oracle_no_dropout():
    q, k, v = make_qkv()
    lens = jnp.array([30, 12], jnp.int32)
    out = fused_mhsa(q, k, v, lens, None, interpret=True)
    ref = mhsa_reference(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fwd_no_lens_full_attention():
    q, k, v = make_qkv(t=24)
    out = fused_mhsa(q, k, v, None, None, interpret=True)
    ref = mhsa_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_grad_matches_oracle_no_dropout():
    q, k, v = make_qkv(t=20)
    lens = jnp.array([20, 9], jnp.int32)

    def f_fused(q, k, v):
        return jnp.sum(fused_mhsa(q, k, v, lens, None, interpret=True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(mhsa_reference(q, k, v, lens) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_dropout_fwd_matches_oracle_with_extracted_masks():
    """Exact parity under dropout: rebuild the kernel's keep-masks via the
    test hook and push them through the reference computation."""
    b, h, t, dh = 2, 2, 18, 8
    q, k, v = make_qkv(b=b, h=h, t=t, dh=dh, seed=1)
    rate = 0.4
    key = jax.random.key(123)
    out = fused_mhsa(q, k, v, None, key, dropout_rate=rate, train=True,
                     interpret=True)

    # identical seed derivation as fused_mhsa
    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    tp = _pad_t(t)
    masks = dropout_masks(b * h, tp, seed, rate, interpret=True)

    # oracle with those masks
    import math

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
    pad = jnp.arange(t)[None, :] >= jnp.full((b,), t)[:, None]
    probs = jax.nn.softmax(
        jnp.where(pad[:, None, None, :], -1e9, scores), axis=-1
    )
    m = masks.reshape(b, h, tp, tp)[:, :, :t, :t]
    probs = jnp.where(m, probs / (1 - rate), 0.0)
    ref = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dropout_grad_matches_oracle_with_extracted_masks():
    b, h, t, dh = 1, 2, 14, 8
    q, k, v = make_qkv(b=b, h=h, t=t, dh=dh, seed=2)
    rate = 0.3
    key = jax.random.key(7)
    lens = jnp.array([11], jnp.int32)

    def f_fused(q, k, v):
        return jnp.sum(
            fused_mhsa(q, k, v, lens, key, dropout_rate=rate, train=True,
                       interpret=True) ** 2
        )

    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    tp = _pad_t(t)
    masks = dropout_masks(b * h, tp, seed, rate, interpret=True)
    m = masks.reshape(b, h, tp, tp)[:, :, :t, :t]

    def f_ref(q, k, v):
        import math

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
        pad = jnp.arange(t)[None, :] >= lens[:, None]
        probs = jax.nn.softmax(
            jnp.where(pad[:, None, None, :], -1e9, scores), axis=-1
        )
        probs = jnp.where(m, probs / (1 - rate), 0.0)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", probs, v) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_rate_statistics():
    rate = 0.5
    masks = dropout_masks(4, 128, jnp.array([42], jnp.int32), rate,
                          interpret=True)
    frac = float(jnp.mean(masks.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.02
    # per-program masks differ
    assert not bool(jnp.all(masks[0] == masks[1]))


def test_same_key_is_deterministic():
    q, k, v = make_qkv(t=16, dh=8)
    key = jax.random.key(9)
    a = fused_mhsa(q, k, v, None, key, dropout_rate=0.3, train=True,
                   interpret=True)
    b = fused_mhsa(q, k, v, None, key, dropout_rate=0.3, train=True,
                   interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_banded_fwd_matches_oracle():
    """Causal left-context banded mask (streaming-compatible Conformer):
    kernel == oracle == the einsum band in models/conformer.py."""
    q, k, v = make_qkv(t=37)
    lens = jnp.array([30, 37], jnp.int32)
    for left in (0, 5, 100):
        out = fused_mhsa(q, k, v, lens, None, interpret=True,
                         left_context=left)
        ref = mhsa_reference(q, k, v, lens, left_context=left)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6, err_msg=f"L={left}")


def test_banded_grad_matches_oracle():
    q, k, v = make_qkv(t=29)
    lens = jnp.array([29, 20], jnp.int32)

    def f_kernel(q, k, v):
        return jnp.sum(
            fused_mhsa(q, k, v, lens, None, interpret=True,
                       left_context=7) ** 2
        )

    def f_ref(q, k, v):
        return jnp.sum(mhsa_reference(q, k, v, lens, left_context=7) ** 2)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_banded_matches_causal_conformer_attention():
    """The full causal Conformer forward gives identical results on the
    fused (banded kernel) path and the einsum path."""
    import dataclasses

    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        conformer_forward,
        init_conformer_params,
    )

    from jax.sharding import Mesh

    from neural_speech_decoder_tpu.models.conformer import (
        _use_fused_attention,
    )
    from neural_speech_decoder_tpu.parallel.kernel_mesh import (
        batch_mappable_mesh,
        kernel_mesh,
    )

    # dh must be 128 for the fused path's shape gate — use latent 256/2
    # heads so the MODEL-level kernel path actually runs (a smaller model
    # would silently take the einsum path for both configs)
    base = dict(
        n_channels=16, n_days=2, frontend_dim=32, latent_dim=256,
        autoencoder_hidden_dim=24, num_layers=2, num_heads=2, ff_dim=32,
        dropout=0.0, temporal_kernel=8, temporal_stride=4, conv_kernel=5,
        use_spec_augment=False, drop_path_prob=0.0, head_dropout=0.0,
        causal=True, attn_left_context=5,
    )
    cfg_twin = ConformerConfig(**base, fused_attention=False)
    cfg_kern = ConformerConfig(**base, fused_attention="force")
    params = init_conformer_params(jax.random.key(0), cfg=cfg_twin)
    b = jax.device_count()  # batch splits over the conftest mesh
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, 64, 16)), jnp.float32)
    days = jnp.asarray(rng.integers(0, 2, size=b), jnp.int32)
    lens = jnp.asarray(rng.integers(40, 65, size=b), jnp.int32)
    ref, ref_lens, _ = conformer_forward(params, cfg_twin, x, days, lens,
                                         train=False, key=None)
    t_frames = ref.shape[1]
    mesh = Mesh(
        np.array(jax.devices()).reshape(jax.device_count(), 1),
        ("data", "model"),
    )
    with kernel_mesh(mesh):
        # guard the silent einsum fallback: the gate must accept AND the
        # mesh must map the batch, else this compares the twin to itself
        assert _use_fused_attention(cfg_kern, t_frames, b)
        if jax.device_count() > 1:
            assert batch_mappable_mesh(b) is not None
        got, got_lens, _ = conformer_forward(
            params, cfg_kern, x, days, lens, train=False, key=None
        )
    np.testing.assert_array_equal(np.asarray(ref_lens),
                                  np.asarray(got_lens))
    # compare only valid frames: positions past each row's output length
    # are padding, where the two lowerings legitimately diverge (the
    # einsum path zeroes masked attention rows, the kernel computes them)
    ref_np, got_np = np.asarray(ref), np.asarray(got)
    for bi, n in enumerate(np.asarray(ref_lens)):
        np.testing.assert_allclose(got_np[bi, :n], ref_np[bi, :n],
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------- qkv-layout production API


def _pack_canonical(q, k, v):
    b, h, t, dh = q.shape
    flat = lambda z: z.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    return jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)


def _pack_interleaved(q, k, v):
    b, h, t, dh = q.shape
    flat = lambda z: z.transpose(0, 2, 1, 3).reshape(b, t, h, dh)
    return jnp.stack([flat(q), flat(k), flat(v)], axis=3).reshape(
        b, t, 3 * h * dh
    )


@pytest.mark.parametrize("interleaved", [False, True])
def test_qkv_api_matches_oracle(interleaved):
    """fused_mhsa_qkv (the production zero-transpose entry) == oracle for
    both supported column layouts, output in head-major [B,T,D]."""
    from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
        fused_mhsa_qkv,
    )

    q, k, v = make_qkv(b=2, h=2, t=29, dh=16, seed=5)
    b, h, t, dh = q.shape
    lens = jnp.array([29, 13], jnp.int32)
    qkv = (_pack_interleaved if interleaved else _pack_canonical)(q, k, v)
    out = fused_mhsa_qkv(qkv, lens, None, num_heads=h, interpret=True,
                         interleaved=interleaved)
    ref = mhsa_reference(q, k, v, lens)
    ref2d = ref.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref2d),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("interleaved", [False, True])
def test_qkv_api_grad_matches_oracle(interleaved):
    """d(qkv) through the custom VJP (incl. the bwd-side column
    reassembly) == autodiff through the oracle for both layouts."""
    from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
        fused_mhsa_qkv,
    )

    q, k, v = make_qkv(b=2, h=2, t=21, dh=8, seed=6)
    b, h, t, dh = q.shape
    lens = jnp.array([21, 11], jnp.int32)
    pack = _pack_interleaved if interleaved else _pack_canonical

    def split(qkv):
        if interleaved:
            z = qkv.reshape(b, t, h, 3, dh)
            return tuple(
                z[:, :, :, i].transpose(0, 2, 1, 3) for i in range(3)
            )
        parts = jnp.split(qkv, 3, axis=-1)
        return tuple(
            z.reshape(b, t, h, dh).transpose(0, 2, 1, 3) for z in parts
        )

    qkv = pack(q, k, v)
    g = jax.grad(
        lambda qkv: jnp.sum(
            fused_mhsa_qkv(qkv, lens, None, num_heads=h, interpret=True,
                           interleaved=interleaved) ** 2
        )
    )(qkv)
    g_ref = jax.grad(
        lambda qkv: jnp.sum(mhsa_reference(*split(qkv), lens) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_qkv_api_left_context_matches_oracle():
    from neural_speech_decoder_tpu.ops.pallas.attention_kernel import (
        fused_mhsa_qkv,
    )

    q, k, v = make_qkv(b=2, h=2, t=33, dh=8, seed=7)
    b, h, t, dh = q.shape
    lens = jnp.array([33, 17], jnp.int32)
    qkv = _pack_canonical(q, k, v)
    out = fused_mhsa_qkv(qkv, lens, None, num_heads=h, interpret=True,
                         left_context=6)
    ref = mhsa_reference(q, k, v, lens, left_context=6)
    ref2d = ref.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref2d),
                               rtol=1e-6, atol=1e-6)
