"""Causal-Conformer streaming: chunked == offline, chunk-boundary-invariant.

The Conformer analog of the GRU streaming tests: the ``causal=True``
config (banded left-context attention + causal depthwise convs) must be
reproduced exactly by ``ConformerStreamer`` fed arbitrary chunk sizes,
and the causal mode must stay a pure restriction (masking) of the model —
same params, same code path, only the mask/padding differ.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoder_tpu.models.conformer import (
    ConformerConfig,
    conformer_forward,
    init_conformer_params,
)
from neural_speech_decoder_tpu.streaming.conformer import ConformerStreamer

CFG = ConformerConfig(
    n_channels=16,
    n_days=2,
    frontend_dim=24,
    latent_dim=24,
    autoencoder_hidden_dim=16,
    num_layers=2,
    num_heads=2,
    ff_dim=32,
    dropout=0.0,
    temporal_kernel=8,
    temporal_stride=4,
    gaussian_smooth_width=2.0,
    conv_kernel=5,
    use_spec_augment=False,
    drop_path_prob=0.0,
    head_dropout=0.0,
    causal=True,
    attn_left_context=6,
)


@pytest.fixture(scope="module")
def setup():
    params = init_conformer_params(jax.random.key(0), cfg=CFG)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 96, CFG.n_channels)).astype(np.float32)
    return params, x


def offline(params, x, cfg=CFG):
    # x_lens=None: no key-padding mask. A live stream has no padding; with
    # lengths given, the reference formula (T-k)//s marks the last realized
    # frame as padding and masks it out of attention (the (T-32)//4 vs
    # floor+1 quirk, SURVEY.md §7), which no streaming decoder would do.
    logp, out_lens, _ = conformer_forward(
        params, cfg, jnp.asarray(x), jnp.asarray([0, 0]),
        None, train=False, key=None,
    )
    # trim to the reference CTC length (T-k)//s — the frame count the
    # streamer realizes (one-frame holdback, streaming/conformer._drain)
    # and the trainer's eval decodes
    n = (x.shape[1] - cfg.temporal_kernel) // cfg.temporal_stride
    return np.asarray(logp)[:, :n]


def stream_all(params, x, bins_per_feed, frames_per_chunk=1):
    st = ConformerStreamer(
        params, CFG, day_idx=0, batch=x.shape[0],
        frames_per_chunk=frames_per_chunk,
    )
    outs = []
    for i in range(0, x.shape[1], bins_per_feed):
        outs.append(st.process(x[:, i: i + bins_per_feed]))
    outs.append(st.flush())
    return np.concatenate(outs, axis=1), st


def test_streaming_matches_offline(setup):
    params, x = setup
    ref = offline(params, x)
    got, _ = stream_all(params, x, bins_per_feed=16, frames_per_chunk=4)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("bins_per_feed", [3, 7, 32])
def test_chunk_boundary_invariance(setup, bins_per_feed):
    params, x = setup
    ref = offline(params, x)
    got, _ = stream_all(params, x, bins_per_feed, frames_per_chunk=2)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_causal_mode_is_prefix_stable(setup):
    """In the causal config, logits for a prefix equal the corresponding
    prefix of the full-utterance logits (no future leakage)."""
    params, x = setup
    full = offline(params, x)
    half_bins = 48
    half = offline(params, x[:, :half_bins])
    # only frames whose full receptive field (incl. the smoother's 4-bin
    # lookahead) lies inside the prefix are determined by it
    k, s = CFG.temporal_kernel, CFG.temporal_stride
    m = (half_bins - k - 4) // s + 1
    np.testing.assert_allclose(
        half[:, :m], full[:, :m], atol=2e-5, rtol=1e-5
    )


def test_noncausal_is_not_prefix_stable(setup):
    """Sanity: the default (bidirectional) config DOES leak future context,
    which is exactly why streaming requires causal=True."""
    params, x = setup
    cfg = dataclasses.replace(CFG, causal=False)
    full = offline(params, x, cfg)
    half = offline(params, x[:, :48], cfg)
    assert not np.allclose(half, full[:, : half.shape[1]], atol=1e-4)


def test_streamer_rejects_noncausal(setup):
    params, _ = setup
    with pytest.raises(ValueError, match="causal"):
        ConformerStreamer(
            params, dataclasses.replace(CFG, causal=False), day_idx=0
        )


def test_streaming_matches_offline_nonzero_day_bias(setup):
    """Edge-padding domain: the offline forward zero-pads the smoother
    AFTER the day affine. With a nonzero day bias (any trained model) the
    streamer must pad in the affined domain too, or the first/last frames
    diverge (caught by this test; init bias is zero so the other tests
    can't see it)."""
    params, x = setup
    params = jax.tree.map(lambda a: a, params)
    params["day"] = dict(params["day"])
    params["day"]["bias"] = params["day"]["bias"] + 0.7
    params["day"]["weight"] = params["day"]["weight"] * 1.1
    ref = offline(params, x)
    got, _ = stream_all(params, x, bins_per_feed=16, frames_per_chunk=2)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


def test_fused_fast_path_matches_offline(setup):
    """Steady-state single-dispatch path (state carried on device) must
    produce the same stream as the 2-dispatch drain path / offline."""
    params, x = setup
    ref = offline(params, x)
    fpc = 2
    st = ConformerStreamer(params, CFG, day_idx=0, batch=x.shape[0],
                           frames_per_chunk=fpc)
    fast_n = CFG.temporal_stride * fpc
    outs = []
    engaged = False
    for i in range(0, x.shape[1] - (x.shape[1] % fast_n), fast_n):
        outs.append(np.asarray(st.process_async(x[:, i: i + fast_n])))
        engaged = engaged or st._fast_state is not None
    tail = x[:, x.shape[1] - (x.shape[1] % fast_n):]
    if tail.shape[1]:
        outs.append(st.process(tail))
    outs.append(st.flush())
    got = np.concatenate(outs, axis=1)
    assert engaged, "fast path never engaged"
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
    # the compiled fused step must survive reset() (per-utterance servers
    # reset between utterances; recompiling each time would cost a full
    # re-trace) and still produce the offline stream on the next utterance
    assert st._fused_cache, "fused step was never cached"
    cached = dict(st._fused_cache)
    st.reset()
    assert st._fused_cache == cached
    outs = []
    engaged2 = False
    for i in range(0, x.shape[1] - (x.shape[1] % fast_n), fast_n):
        outs.append(np.asarray(st.process_async(x[:, i: i + fast_n])))
        engaged2 = engaged2 or st._fast_state is not None
    tail = x[:, x.shape[1] - (x.shape[1] % fast_n):]
    if tail.shape[1]:
        outs.append(st.process(tail))
    outs.append(st.flush())
    # without this, the slow drain path could silently substitute for the
    # cached fused step on the replay and the comparison would still pass
    assert engaged2, "fast path did not re-engage after reset()"
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), ref, atol=2e-5, rtol=1e-5
    )


def test_streaming_beam_chains_on_device(setup):
    """decode_beam carries BeamState across chunks and matches an offline
    prefix beam search over the full streamed log-probs."""
    from neural_speech_decoder_tpu.decoding.ondevice_beam import (
        prefix_beam_search,
    )

    params, x = setup
    st = ConformerStreamer(params, CFG, day_idx=0, batch=x.shape[0],
                           frames_per_chunk=2)
    all_logp = []
    nbest = None
    for i in range(0, x.shape[1], 8):
        out = st.process_async(x[:, i: i + 8])
        all_logp.append(np.asarray(out))
        nbest = st.decode_beam(out, beam_width=4, max_len=64)
    out = st.flush()
    all_logp.append(np.asarray(out))
    nbest = st.decode_beam(out, beam_width=4, max_len=64)
    logp = np.concatenate(all_logp, axis=1)
    t_frames = logp.shape[1]
    ref = prefix_beam_search(
        jnp.asarray(logp, jnp.float32),
        jnp.full((x.shape[0],), t_frames, jnp.int32),
        beam_width=4, top_k_tokens=8,
    )
    np.testing.assert_allclose(
        np.asarray(nbest[2]), np.asarray(ref[2]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(nbest[0])[:, :, :t_frames],
        np.asarray(ref[0])[:, :, :t_frames],
    )


def test_incremental_greedy_decode(setup):
    params, x = setup
    ref = offline(params, x)
    got, st = stream_all(params, x, bins_per_feed=16, frames_per_chunk=2)
    # offline greedy decode
    ids = np.argmax(ref, axis=-1)
    want = []
    for b in range(ids.shape[0]):
        prev, seq = -1, []
        for tok in ids[b]:
            if tok != prev and tok != 0:
                seq.append(int(tok))
            prev = tok
        want.append(seq)
    # streamed greedy decode (replay the chunks through decode_greedy)
    st2 = ConformerStreamer(params, CFG, day_idx=0, batch=x.shape[0],
                            frames_per_chunk=2)
    streamed = [[] for _ in range(x.shape[0])]
    for i in range(0, x.shape[1], 16):
        out = st2.process(x[:, i: i + 16])
        for b, seq in enumerate(st2.decode_greedy(out)):
            streamed[b].extend(seq)
    for b, seq in enumerate(st2.decode_greedy(st2.flush())):
        streamed[b].extend(seq)
    assert streamed == want


def test_zero_left_context_streams(setup):
    """attn_left_context=0 (frame-local attention): the KV cache must stay
    width 0 across chunks — a negative-index roll (keys[:, :, -0:]) would
    keep the whole buffer, growing state and breaking the mask shape on
    the second chunk — and the stream must still match offline."""
    params, x = setup
    cfg0 = dataclasses.replace(CFG, attn_left_context=0)
    ref = offline(params, x, cfg0)
    st = ConformerStreamer(params, cfg0, day_idx=0, batch=x.shape[0],
                           frames_per_chunk=2)
    outs = []
    for i in range(0, x.shape[1], 8):
        outs.append(st.process(x[:, i: i + 8]))
        # check the LIVE cache: once the fast path promotes, the carried
        # caches live in _fast_state and st._caches is a stale snapshot
        kv_k = (st._fast_state[2][0] if st._fast_state is not None
                else st._caches[0])
        assert kv_k.shape[3] == 0  # K cache width stays 0
    outs.append(st.flush())
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_chunk_pattern_fuzz(setup, seed):
    """Differential fuzz: random chunk-size sequences (1..13 bins, with
    fast-path promote/demote transitions) must reproduce the offline
    causal forward over the reference CTC length."""
    params, _ = setup
    rng = np.random.default_rng(200 + seed)
    t = int(rng.integers(64, 128))
    x = rng.standard_normal((2, t, CFG.n_channels)).astype(np.float32)
    ref = offline(params, x)
    st = ConformerStreamer(params, CFG, day_idx=0, batch=2,
                           frames_per_chunk=int(rng.integers(1, 4)))
    outs, pos = [], 0
    while pos < t:
        n = int(rng.integers(1, 14))
        outs.append(st.process(x[:, pos: pos + n]))
        pos += n
    outs.append(st.flush())
    got = np.concatenate(outs, axis=1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
