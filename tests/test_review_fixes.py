"""Regression tests for the round-3 self-review findings (streaming edge
configs, PE budget, beam capacity, native-stream lifetime)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoder_tpu.models.gru import (
    GRUConfig,
    gru_forward,
    init_gru_params,
)
from neural_speech_decoder_tpu.streaming.engine import GRUStreamer


def make_gru(width=2.0, ksize=20):
    cfg = GRUConfig(
        neural_dim=8, n_classes=6, hidden_dim=16, num_layers=1, n_days=2,
        dropout=0.0, stride_len=4, kernel_len=8, gaussian_smooth_width=width,
        gaussian_kernel_size=ksize, bidirectional=False,
    )
    params = init_gru_params(jax.random.key(0), cfg)
    return params, cfg


def test_gru_streamer_zero_smooth_width_matches_offline():
    """sigma<=0: offline smoothing is a no-op; the streamer must not
    build NaN Gaussian taps (reproduced: all-NaN logits pre-fix) and must
    still match offline exactly."""
    params, cfg = make_gru(width=0.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 96, cfg.neural_dim)).astype(np.float32)
    ref = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([0]))
    )
    st = GRUStreamer(params, cfg, day_idx=0, frames_per_chunk=1)
    outs = []
    for i in range(0, 96, 4):  # stride-sized chunks engage the fast path
        outs.append(np.asarray(st.process_async(x[:, i: i + 4])))
    outs.append(st.flush())
    got = np.concatenate(outs, axis=1)
    assert np.all(np.isfinite(got))
    # the stream realizes the reference CTC length (T-k)//s (one-frame
    # holdback; streaming/engine._drain)
    ref = ref[:, : (96 - cfg.kernel_len) // cfg.stride_len]
    # pre-fix: 1-tap kernel made the fused fast path re-emit old frames
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_conformer_streamer_rejects_even_smooth_kernel():
    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        init_conformer_params,
    )
    from neural_speech_decoder_tpu.streaming.conformer import (
        ConformerStreamer,
    )

    cfg = ConformerConfig(
        n_channels=8, n_days=1, frontend_dim=8, latent_dim=8,
        autoencoder_hidden_dim=8, num_layers=1, num_heads=1, ff_dim=8,
        temporal_kernel=8, temporal_stride=4, conv_kernel=3,
        use_spec_augment=False, causal=True,
        gaussian_smooth_width=0.75,  # int(4*0.75)+1 = 4 taps (even)
    )
    params = init_conformer_params(jax.random.key(0), cfg=cfg)
    with pytest.raises(ValueError, match="even"):
        ConformerStreamer(params, cfg, day_idx=0)


def test_conformer_streamer_unbounded_pe():
    """Round-5: live streams have NO PE length cap — a session crosses a
    tiny max_pos_len=8 table bound without error and matches the offline
    forward run with a large table (PE computed on the fly)."""
    import dataclasses

    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        conformer_forward,
        init_conformer_params,
    )
    from neural_speech_decoder_tpu.streaming.conformer import (
        ConformerStreamer,
    )

    cfg = ConformerConfig(
        n_channels=8, n_days=1, frontend_dim=8, latent_dim=8,
        autoencoder_hidden_dim=8, num_layers=1, num_heads=1, ff_dim=8,
        dropout=0.0, temporal_kernel=8, temporal_stride=4, conv_kernel=3,
        use_spec_augment=False, drop_path_prob=0.0, head_dropout=0.0,
        causal=True, attn_left_context=4, max_pos_len=8,
    )
    params = init_conformer_params(jax.random.key(0), cfg=cfg)
    st = ConformerStreamer(params, cfg, day_idx=0, frames_per_chunk=1)
    rng = np.random.default_rng(0)
    t = 168  # 40 encoder frames — 5x past the old max_pos_len=8 cap
    x = rng.standard_normal((1, t, 8)).astype(np.float32)
    out = [st.process(x[:, i : i + 4]) for i in range(0, t, 4)]
    out.append(st.flush())
    streamed = np.concatenate(out, axis=1)
    big = dataclasses.replace(cfg, max_pos_len=256)
    logp, _, _ = conformer_forward(
        params, big, jnp.asarray(x), jnp.asarray([0]), None,
        train=False, key=None,
    )
    offline = np.asarray(logp)[:, : (t - 8) // 4]
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_ondevice_beam_lens_capped_at_max_len():
    """Past prefix capacity, lens clamp to max_len and the stored prefix
    stops churning (truncated-tail semantics)."""
    from neural_speech_decoder_tpu.decoding.ondevice_beam import (
        prefix_beam_search,
    )

    # logits that force a long alternating label sequence: 1,2,1,2,...
    t, k = 24, 4
    lp = np.full((1, t, k), -10.0, np.float32)
    for i in range(t):
        lp[0, i, 1 + (i % 2)] = 0.0
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    max_len = 6
    pref, lens, scores = prefix_beam_search(
        jnp.asarray(lp), jnp.array([t], jnp.int32), beam_width=4,
        top_k_tokens=3,
    )
    # the unconstrained search must actually decode past the cap, else
    # the truncation assertions below would pass vacuously
    assert int(np.max(np.asarray(lens))) > max_len
    # now re-run with a tiny cap
    from neural_speech_decoder_tpu.decoding.ondevice_beam import (
        beam_extend,
        beam_finalize,
        beam_init,
    )

    state = beam_init(1, 4, max_len)
    state = beam_extend(state, jnp.asarray(lp), top_k_tokens=3)
    pref_c, lens_c, _ = beam_finalize(state)
    assert int(np.max(np.asarray(lens_c))) <= max_len
    assert np.asarray(pref_c).shape[-1] == max_len


def test_lm_stream_use_after_close_raises():
    from neural_speech_decoder_tpu.decoding.lm_decoder import (
        build_lm_decoder,
        native_available,
        open_stream,
    )

    if not native_available():
        pytest.skip("native decoder not built")
    import tempfile, os

    d = tempfile.mkdtemp()
    lex = os.path.join(d, "lex.txt")
    with open(lex, "w") as f:
        f.write("cat K AE T\n")
    dec = build_lm_decoder(lex, None, nbest=4)
    s = open_stream(dec)
    s.close()
    lp = np.zeros((2, 41), np.float32)
    with pytest.raises(RuntimeError, match="closed"):
        s.feed(lp)
    with pytest.raises(RuntimeError, match="closed"):
        s.nbest()


def test_lexicon_skips_unknown_phone_entries(tmp_path):
    """Entries with out-of-set phones are skipped whole (both engines) —
    a truncated pronunciation would decode the word on the wrong
    phones."""
    from neural_speech_decoder_tpu.decoding.lexicon import Lexicon

    lex_path = tmp_path / "lex.txt"
    lex_path.write_text("about AX B AW T\ncat K AE T\n")
    lex = Lexicon.from_file(str(lex_path))
    assert "cat" in lex.word_ids
    assert "about" not in lex.word_ids  # AX is outside the 39+SIL set


def test_config_overrides_through_null_section_and_sci_notation():
    from neural_speech_decoder_tpu.utils.config import apply_overrides

    out = apply_overrides(
        {"model": None}, ["model.lr=1e-3", "tag=v1_5e"]
    )
    assert out["model"]["lr"] == 1e-3  # null section becomes a dict
    assert out["tag"] == "v1_5e"  # non-scientific strings stay strings


def test_fused_frontend_clamps_day_index():
    """Out-of-range day indices clip like the XLA day_affine path."""
    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.ops.pallas.frontend_kernel import (
        fused_frontend,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 128, 128)) * 0.1, jnp.float32)
    b = jnp.zeros((2, 128), jnp.float32)
    ref = fused_frontend(
        x, w, b, jnp.array([1, 1], jnp.int32), kernel_size=5, sigma=1.0,
        interpret=True,
    )
    got = fused_frontend(
        x, w, b, jnp.array([7, -3], jnp.int32), kernel_size=5, sigma=1.0,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got)[0], np.asarray(ref)[0]
    )  # 7 clips to 1
    # -3 clips to 0 (NOT python-style wrap to -3 % nDays = 1): compare
    # against an explicit day-0 evaluation, matching ops/day_affine's
    # jnp.clip semantics
    ref0 = fused_frontend(
        x, w, b, jnp.array([0, 0], jnp.int32), kernel_size=5, sigma=1.0,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got)[1], np.asarray(ref0)[1])
