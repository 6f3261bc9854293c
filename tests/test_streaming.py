"""Streaming inference: exactness vs offline forward, chunk invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.gru import (
    GRUConfig,
    gru_forward,
    init_gru_params,
)
from neural_speech_decoder_tpu.streaming.engine import GRUStreamer


def make_model(seed=0):
    cfg = GRUConfig(
        neural_dim=12,
        n_classes=8,
        hidden_dim=16,
        num_layers=2,
        n_days=3,
        dropout=0.0,
        stride_len=4,
        kernel_len=8,
        gaussian_smooth_width=2.0,
        bidirectional=False,
    )
    params = init_gru_params(jax.random.key(seed), cfg)
    # randomize day weights so calibration is exercised
    params["day"]["weight"] = params["day"]["weight"] + 0.1 * jax.random.normal(
        jax.random.key(seed + 1), params["day"]["weight"].shape
    )
    params["day"]["bias"] = 0.1 * jax.random.normal(
        jax.random.key(seed + 2), params["day"]["bias"].shape
    )
    return params, cfg


@pytest.mark.parametrize("feed", [1, 4, 7, 40])
def test_streaming_matches_offline(feed):
    params, cfg = make_model()
    rng = np.random.default_rng(0)
    t = 40
    x = rng.standard_normal((1, t, cfg.neural_dim)).astype(np.float32)

    offline = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([1]))
    )

    streamer = GRUStreamer(params, cfg, day_idx=1, frames_per_chunk=2)
    outs = []
    for start in range(0, t, feed):
        outs.append(streamer.process(x[:, start : start + feed]))
    outs.append(streamer.flush())
    streamed = np.concatenate(outs, axis=1)

    # the stream realizes the reference CTC length (t-k)//s — one frame
    # fewer than the offline forward's unfold produces; the trainer's eval
    # decodes exactly this prefix (ops/unfold.py::ctc_input_lengths)
    ref_len = (t - cfg.kernel_len) // cfg.stride_len
    assert streamed.shape == offline[:, :ref_len].shape
    np.testing.assert_allclose(streamed, offline[:, :ref_len], atol=1e-4)


def test_streaming_emits_incrementally():
    params, cfg = make_model()
    rng = np.random.default_rng(1)
    streamer = GRUStreamer(params, cfg, day_idx=0, frames_per_chunk=1)
    emitted = 0
    for _ in range(10):
        out = streamer.process(
            rng.standard_normal((1, 4, cfg.neural_dim)).astype(np.float32)
        )
        emitted += out.shape[1]
    # 40 bins fed; with 10-bin lookahead, 30 smoothed bins -> frames at
    # stride 4 with kernel 8 under the one-frame holdback (a frame emits
    # once its window plus one more stride is present):
    # floor((30-8-4)/4)+1 = 5 frames already out.
    assert emitted == 5
    out = streamer.flush()
    # total realizes the reference CTC length (40-8)//4, not the unfold's
    # (40-8)//4 + 1
    assert emitted + out.shape[1] == (40 - 8) // 4


def test_fast_path_engages_and_matches_offline():
    params, cfg = make_model()
    rng = np.random.default_rng(3)
    t = 96
    x = rng.standard_normal((1, t, cfg.neural_dim)).astype(np.float32)
    offline = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([1]))
    )
    s = GRUStreamer(params, cfg, day_idx=1, frames_per_chunk=1)
    outs = []
    engaged = False
    for start in range(0, t, cfg.stride_len):
        outs.append(s.process(x[:, start : start + cfg.stride_len]))
        engaged = engaged or s._fast_state is not None
    outs.append(s.flush())
    streamed = np.concatenate(outs, axis=1)
    assert engaged, "single-dispatch fast path never engaged"
    ref_len = (t - cfg.kernel_len) // cfg.stride_len
    np.testing.assert_allclose(streamed, offline[:, :ref_len], atol=1e-4)


def test_fast_path_demotes_on_odd_chunk():
    params, cfg = make_model()
    rng = np.random.default_rng(4)
    t = 80
    x = rng.standard_normal((1, t, cfg.neural_dim)).astype(np.float32)
    offline = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([2]))
    )
    s = GRUStreamer(params, cfg, day_idx=2, frames_per_chunk=1)
    outs = []
    # Mixed chunk sizes force promote/demote transitions mid-stream.
    pos = 0
    for n in (4, 4, 4, 4, 4, 7, 4, 4, 4, 4, 5, 4, 4, 4, 4, 4, 4, 4, 4):
        outs.append(s.process(x[:, pos : pos + n]))
        pos += n
    assert pos == t
    outs.append(s.flush())
    streamed = np.concatenate(outs, axis=1)
    ref_len = (t - cfg.kernel_len) // cfg.stride_len
    np.testing.assert_allclose(streamed, offline[:, :ref_len], atol=1e-4)


def test_incremental_greedy_decode_matches_offline():
    from neural_speech_decoder_tpu.ops.decode import greedy_decode

    params, cfg = make_model()
    rng = np.random.default_rng(5)
    t = 100
    x = rng.standard_normal((1, t, cfg.neural_dim)).astype(np.float32)
    s = GRUStreamer(params, cfg, day_idx=0, frames_per_chunk=1)
    streamed_tokens = []
    for start in range(0, t, 4):
        out = s.process(x[:, start : start + 4])
        streamed_tokens += s.decode_greedy(out)[0]
    streamed_tokens += s.decode_greedy(s.flush())[0]

    offline = gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([0]))
    # decode the reference CTC length, exactly like the trainer's eval
    toks, lens = greedy_decode(
        offline, jnp.asarray([(t - cfg.kernel_len) // cfg.stride_len])
    )
    np.testing.assert_array_equal(
        streamed_tokens, np.asarray(toks[0, : lens[0]])
    )


def test_streaming_rejects_bidirectional():
    cfg = GRUConfig(bidirectional=True, neural_dim=4, hidden_dim=8,
                    num_layers=1, n_days=1, kernel_len=4, stride_len=2)
    params = init_gru_params(jax.random.key(0), cfg)
    with pytest.raises(ValueError):
        GRUStreamer(params, cfg, day_idx=0)


def test_reset_decode_state():
    """reset() must clear the incremental CTC collapse state: decoding the
    same stream twice around a reset yields identical phoneme output (the
    carried previous-argmax token must not leak across utterances)."""
    params, cfg = make_model()
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 60, cfg.neural_dim)).astype(np.float32)
    s = GRUStreamer(params, cfg, day_idx=1, frames_per_chunk=1)

    def run_once():
        toks = []
        for start in range(0, 60, 4):
            toks += s.decode_greedy(s.process(x[:, start : start + 4]))[0]
        toks += s.decode_greedy(s.flush())[0]
        return toks

    first = run_once()
    s.reset()
    second = run_once()
    assert first == second
    s.reset()
    np.testing.assert_array_equal(s._decode_prev, [-1])


@pytest.mark.slow
def test_causal_mode_accuracy_cost():
    """Quantify the PER cost of causal=True (zero lookahead) vs the 10-bin
    lookahead mode on a synthetic-trained unidirectional model.

    The causal smoother renormalizes the past taps, so early recurrent state
    differs from offline; the decoded stream should still be close. We gate
    on the causal PER staying within an absolute band of the offline PER
    rather than exact parity (the point of causal mode is latency, not
    bit-exactness).
    """
    from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
    from neural_speech_decoder_tpu.ops.decode import batch_per, greedy_decode
    from neural_speech_decoder_tpu.training.trainer import (
        build_model,
        load_model,
        train_model,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        args = {
            "outputDir": td,
            "dataset": synthetic_dataset(
                seed=0, n_days=2, trials_per_day=16, n_channels=12,
                min_t=60, max_t=100, min_u=3, max_u=6, signal_scale=3.0,
            ),
            "batchSize": 8, "lrStart": 0.02, "lrEnd": 0.02,
            "l2_decay": 1e-5, "nBatch": 120, "evalEvery": 60,
            "whiteNoiseSD": 0.1, "constantOffsetSD": 0.02,
            "gaussianSmoothWidth": 2.0, "nUnits": 48, "nLayers": 2,
            "nInputFeatures": 12, "nClasses": 40, "dropout": 0.0,
            "strideLen": 4, "kernelLen": 8, "bidirectional": False,
            "seed": 0, "wandb_mode": "disabled", "time_multiple": 16,
            "watch_log_freq": 0,
        }
        train_model(args)
        params, model, _ = load_model(td, 2)
    cfg = model.config

    test_days = args["dataset"]["test"]

    def stream_per(causal):
        total_d, total_l = 0, 0
        for day, trials in enumerate(test_days):
            for feats, phones in zip(
                trials["sentenceDat"], trials["phonemes"]
            ):
                s = GRUStreamer(
                    params, cfg, day_idx=day, frames_per_chunk=1,
                    causal=causal,
                )
                toks = []
                x = np.asarray(feats, np.float32)[None]
                for start in range(0, x.shape[1], 4):
                    toks += s.decode_greedy(
                        s.process(x[:, start : start + 4])
                    )[0]
                toks += s.decode_greedy(s.flush())[0]
                ref = [p for p in np.asarray(phones).tolist() if p != 0]
                toks_arr = np.asarray([toks + [0]], dtype=np.int64)
                d, l = batch_per(
                    toks_arr,
                    np.asarray([len(toks)]),
                    np.asarray([ref + [0]], dtype=np.int64),
                    np.asarray([len(ref)]),
                )
                total_d += d
                total_l += l
        return total_d / max(total_l, 1)

    per_offline = stream_per(causal=False)
    per_causal = stream_per(causal=True)
    print(f"streaming PER lookahead={per_offline:.3f} causal={per_causal:.3f}")
    assert np.isfinite(per_causal)
    # Causal mode trades the 200 ms lookahead for a bounded accuracy hit.
    assert per_causal <= per_offline + 0.15


def test_reset_reproduces():
    params, cfg = make_model()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 30, cfg.neural_dim)).astype(np.float32)
    s = GRUStreamer(params, cfg, day_idx=2)
    a = np.concatenate([s.process(x), s.flush()], axis=1)
    s.reset()
    b = np.concatenate([s.process(x), s.flush()], axis=1)
    np.testing.assert_array_equal(a, b)


def test_streaming_beam_decode_matches_offline_search():
    """Chunked decode_beam == offline prefix_beam_search on the full
    logit sequence (chunk-boundary-invariant carried BeamState)."""
    from neural_speech_decoder_tpu.decoding.ondevice_beam import (
        prefix_beam_search,
    )

    params, cfg = make_model()
    rng = np.random.default_rng(5)
    t = 60
    b = 2
    x = rng.standard_normal((b, t, cfg.neural_dim)).astype(np.float32)

    offline_logits = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([1, 1]))
    )
    # the stream realizes the reference CTC length, so the offline search
    # must run over the same prefix (trainer-eval semantics)
    t_frames = (t - cfg.kernel_len) // cfg.stride_len
    off_pref, off_lens, off_scores = jax.tree.map(
        np.asarray,
        prefix_beam_search(
            jax.nn.log_softmax(jnp.asarray(offline_logits), axis=-1),
            jnp.full((b,), t_frames, jnp.int32),
            beam_width=6,
            top_k_tokens=6,
        ),
    )

    streamer = GRUStreamer(
        params, cfg, day_idx=1, batch=b, frames_per_chunk=2
    )
    nbest = None
    for start in range(0, t, 7):  # ragged chunking on purpose
        out = streamer.process(x[:, start : start + 7])
        nbest = streamer.decode_beam(out, beam_width=6, top_k_tokens=6)
    out = streamer.flush()
    nbest = streamer.decode_beam(out, beam_width=6, top_k_tokens=6)
    st_pref, st_lens, st_scores = jax.tree.map(np.asarray, nbest)

    np.testing.assert_array_equal(st_lens, off_lens)
    np.testing.assert_allclose(st_scores, off_scores, atol=1e-4)
    np.testing.assert_array_equal(
        st_pref[:, :, :t_frames], off_pref[:, :, :t_frames]
    )
    assert np.all(st_pref[:, :, t_frames:] == 0)


def test_streaming_beam_reset_clears_state():
    params, cfg = make_model()
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 40, cfg.neural_dim)).astype(np.float32)
    streamer = GRUStreamer(params, cfg, day_idx=0, frames_per_chunk=1)
    out = streamer.process(x)
    first = jax.tree.map(np.asarray, streamer.decode_beam(out))
    streamer.reset()
    out2 = streamer.process(x)
    again = jax.tree.map(np.asarray, streamer.decode_beam(out2))
    np.testing.assert_array_equal(first[0], again[0])
    np.testing.assert_allclose(first[2], again[2], atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_chunk_pattern_fuzz(seed):
    """Differential fuzz: ANY chunk-size sequence (1..17 bins, including
    promote/demote transitions through the fast path) must reproduce the
    offline forward over the reference CTC length."""
    params, cfg = make_model()
    rng = np.random.default_rng(100 + seed)
    t = int(rng.integers(60, 140))
    x = rng.standard_normal((2, t, cfg.neural_dim)).astype(np.float32)
    offline = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([1, 1]))
    )
    s = GRUStreamer(params, cfg, day_idx=1, batch=2,
                    frames_per_chunk=int(rng.integers(1, 4)))
    outs, pos = [], 0
    while pos < t:
        n = int(rng.integers(1, 18))
        outs.append(s.process(x[:, pos: pos + n]))
        pos += n
    outs.append(s.flush())
    streamed = np.concatenate(outs, axis=1)
    ref_len = (t - cfg.kernel_len) // cfg.stride_len
    assert streamed.shape[1] == ref_len
    np.testing.assert_allclose(streamed, offline[:, :ref_len], atol=1e-4)
