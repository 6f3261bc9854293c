"""AOT inference export (serving/export.py): the serialized StableHLO
artifact must reload from disk and reproduce the live eval forward, for
both model families, with shape enforcement. Logit parity is to float
round-off (measured max 1e-6 on the Conformer): the artifact recompiles
from serialized StableHLO, and XLA does not promise identical fusion
order across separate compilations. Lengths are exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
from neural_speech_decoder_tpu.serving import export_inference, load_exported
from neural_speech_decoder_tpu.training.trainer import load_model, train_model

DATA = dict(seed=3, n_days=2, trials_per_day=6, n_channels=8,
            min_t=40, max_t=60, min_u=2, max_u=3, signal_scale=3.0)

BASE = {
    "batchSize": 4, "nBatch": 2, "evalEvery": 1, "seed": 0,
    "nInputFeatures": 8, "nClasses": 40, "whiteNoiseSD": 0.1,
    "constantOffsetSD": 0.0, "wandb_mode": "disabled",
    "time_multiple": 16, "maxTimeSeriesLen": 64,
}

GRU_ARGS = dict(BASE, lrStart=0.005, lrEnd=0.001, l2_decay=1e-5,
                gaussianSmoothWidth=2.0, nUnits=16, nLayers=2, dropout=0.0,
                strideLen=4, kernelLen=8, bidirectional=True)

CONF_ARGS = dict(
    BASE, model_type="transformer_ctc", temporal_kernel=8,
    temporal_stride=4, gaussian_smooth_width=2.0, frontend_dim=16,
    latent_dim=16, autoencoder_hidden_dim=12, transformer_num_layers=2,
    transformer_n_heads=2, transformer_dim_ff=24, transformer_dropout=0.1,
    conformer_conv_kernel=5, drop_path_prob=0.0, optimizer="adamw",
    lrStart=4e-4, lrEnd=1e-4, weight_decay=1e-3, warmup_steps=1,
    label_smoothing=0.1, use_spec_augment=True, spec_augment_freq_mask=4,
    spec_augment_time_mask=3,
)


def _train(tmp_path, extra):
    args = dict(extra, outputDir=str(tmp_path / "run"),
                dataset=synthetic_dataset(**DATA))
    train_model(args)
    return args["outputDir"]


def _batch(b, t, c, n_days, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    days = rng.integers(0, n_days, size=b).astype(np.int32)
    x_lens = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    return x, days, x_lens


@pytest.mark.parametrize("family_args", [GRU_ARGS, CONF_ARGS],
                         ids=["gru", "conformer"])
def test_export_roundtrip_bit_exact(tmp_path, family_args):
    run_dir = _train(tmp_path, family_args)
    art = export_inference(run_dir, str(tmp_path / "art"),
                           batch_size=4, t_max=64)

    model = load_exported(art)
    assert model.meta["batch_size"] == 4
    assert model.meta["t_max"] == 64
    assert model.meta["model_type"] == family_args.get(
        "model_type", "gru_baseline"
    )

    x, days, x_lens = _batch(4, 64, 8, DATA["n_days"])
    got_lp, got_lens = model(x, days, x_lens)

    # live forward from the same checkpoint
    params, live, _ = load_model(run_dir)
    want_lp, want_lens, _ = live.forward(
        params, jnp.asarray(x), jnp.asarray(days), jnp.asarray(x_lens),
        train=False, key=None,
    )
    np.testing.assert_array_equal(np.asarray(got_lens),
                                  np.asarray(want_lens))
    np.testing.assert_allclose(np.asarray(got_lp), np.asarray(want_lp),
                               rtol=1e-5, atol=1e-5)


def test_export_enforces_envelope(tmp_path):
    run_dir = _train(tmp_path, GRU_ARGS)
    art = export_inference(run_dir, str(tmp_path / "art"),
                           batch_size=4, t_max=64)
    model = load_exported(art)
    x, days, x_lens = _batch(2, 64, 8, DATA["n_days"])  # wrong batch
    with pytest.raises(Exception):
        model(x, days, x_lens)


def test_exported_artifact_needs_no_model_code(tmp_path):
    """The loader path touches only serving/ + jax — simulate by loading
    in a subprocess that never imports models/ or training/."""
    import subprocess
    import sys as _sys

    run_dir = _train(tmp_path, GRU_ARGS)
    art = export_inference(run_dir, str(tmp_path / "art"),
                           batch_size=4, t_max=64)
    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {repr(str(_sys.path[0]))})
import numpy as np
from neural_speech_decoder_tpu.serving import load_exported
m = load_exported({repr(art)})
x = np.zeros((4, 64, 8), np.float32)
days = np.zeros((4,), np.int32)
lens = np.full((4,), 64, np.int32)
lp, ol = m(x, days, lens)
assert lp.shape[0] == 4 and np.isfinite(np.asarray(lp)).all()
banned = [k for k in sys.modules
          if "neural_speech_decoder_tpu.models" in k
          or "neural_speech_decoder_tpu.training" in k]
assert not banned, banned
print("OK")
"""
    out = subprocess.run([_sys.executable, "-c", code],
                         capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


# -- streaming export --------------------------------------------------------

def _stream_model(seed=0):
    from neural_speech_decoder_tpu.models.gru import (
        GRUConfig, init_gru_params,
    )

    cfg = GRUConfig(
        neural_dim=12, n_classes=8, hidden_dim=16, num_layers=2, n_days=3,
        dropout=0.0, stride_len=4, kernel_len=8, gaussian_smooth_width=2.0,
        bidirectional=False,
    )
    params = init_gru_params(jax.random.key(seed), cfg)
    params["day"]["weight"] = params["day"]["weight"] + 0.1 * (
        jax.random.normal(jax.random.key(seed + 1),
                          params["day"]["weight"].shape)
    )
    params["day"]["bias"] = 0.1 * jax.random.normal(
        jax.random.key(seed + 2), params["day"]["bias"].shape
    )
    return params, cfg


@pytest.mark.parametrize("feed", [1, 5, 8, 37])
def test_exported_streamer_matches_offline(tmp_path, feed):
    from neural_speech_decoder_tpu.models.gru import gru_forward
    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported_streamer,
    )

    params, cfg = _stream_model()
    art = export_streaming_params(
        params, cfg, str(tmp_path / "sart"), day_idx=1, batch=2,
        frames_per_chunk=2,
    )
    st = load_exported_streamer(art)

    rng = np.random.default_rng(1)
    t = 53
    x = rng.standard_normal((2, t, cfg.neural_dim)).astype(np.float32)
    offline = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([1, 1]))
    )
    ref_len = (t - cfg.kernel_len) // cfg.stride_len

    got = []
    for i in range(0, t, feed):
        got.append(st.feed(x[:, i : i + feed]))
    got.append(st.flush())
    streamed = np.concatenate(got, axis=1)
    assert streamed.shape == offline[:, :ref_len].shape
    np.testing.assert_allclose(streamed, offline[:, :ref_len], atol=1e-4)


def test_exported_streamer_matches_live_streamer(tmp_path):
    """Exported artifact vs the live GRUStreamer on the same stream,
    including incremental greedy decodes."""
    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported_streamer,
    )
    from neural_speech_decoder_tpu.streaming.engine import GRUStreamer

    params, cfg = _stream_model(seed=4)
    art = export_streaming_params(
        params, cfg, str(tmp_path / "sart"), day_idx=0, batch=1,
        frames_per_chunk=1,
    )
    exp = load_exported_streamer(art)
    live = GRUStreamer(params, cfg, 0, batch=1, frames_per_chunk=1)

    rng = np.random.default_rng(2)
    t = 41
    x = rng.standard_normal((1, t, cfg.neural_dim)).astype(np.float32)
    exp_logits, live_logits = [], []
    exp_ids, live_ids = [], []
    for i in range(0, t, 4):
        a = exp.feed(x[:, i : i + 4])
        b = live.process(x[:, i : i + 4])
        exp_logits.append(a); live_logits.append(b)
        exp_ids[len(exp_ids):] = exp.decode_greedy(a)[0]
        live_ids[len(live_ids):] = live.decode_greedy(b)[0]
    a = exp.flush(); b = live.flush()
    exp_logits.append(a); live_logits.append(b)
    exp_ids[len(exp_ids):] = exp.decode_greedy(a)[0]
    live_ids[len(live_ids):] = live.decode_greedy(b)[0]

    ea = np.concatenate(exp_logits, axis=1)
    la = np.concatenate(live_logits, axis=1)
    assert ea.shape == la.shape
    np.testing.assert_allclose(ea, la, atol=1e-4)
    assert exp_ids == live_ids


def test_exported_streamer_short_utterance(tmp_path):
    """Utterance shorter than the prime window still flushes to exactly
    the reference CTC length."""
    from neural_speech_decoder_tpu.models.gru import gru_forward
    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported_streamer,
    )

    params, cfg = _stream_model(seed=7)
    art = export_streaming_params(
        params, cfg, str(tmp_path / "sart"), day_idx=2, batch=1,
        frames_per_chunk=4,
    )
    st = load_exported_streamer(art)
    # prime needs k + 4*s + pad_r = 8 + 16 + 10 = 34 bins; feed only 17
    t = 17
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, t, cfg.neural_dim)).astype(np.float32)
    out = [st.feed(x), st.flush()]
    streamed = np.concatenate(out, axis=1)
    ref_len = (t - cfg.kernel_len) // cfg.stride_len
    assert streamed.shape[1] == ref_len
    offline = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x), jnp.asarray([2]))
    )
    np.testing.assert_allclose(streamed, offline[:, :ref_len], atol=1e-4)


def test_exported_streamer_feed_async(tmp_path):
    """feed_async returns unsynced device arrays whose concatenation
    equals the feed() path."""
    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported_streamer,
    )

    params, cfg = _stream_model(seed=9)
    art = export_streaming_params(
        params, cfg, str(tmp_path / "sart"), day_idx=0, batch=1,
        frames_per_chunk=2,
    )
    a, b = load_exported_streamer(art), load_exported_streamer(art)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 48, cfg.neural_dim)).astype(np.float32)
    via_feed = [a.feed(x[:, i : i + 6]) for i in range(0, 48, 6)]
    via_async = []
    for i in range(0, 48, 6):
        via_async += [np.asarray(c) for c in b.feed_async(x[:, i : i + 6])]
    fa = np.concatenate(via_feed + [a.flush()], axis=1)
    fb = np.concatenate(via_async + [b.flush()], axis=1)
    np.testing.assert_array_equal(fa, fb)


# -- conformer streaming export ----------------------------------------------

def _conf_stream_model(seed=0):
    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig, init_conformer_params,
    )

    cfg = ConformerConfig(
        n_channels=16, n_days=2, frontend_dim=24, latent_dim=24,
        autoencoder_hidden_dim=16, num_layers=2, num_heads=2, ff_dim=32,
        dropout=0.0, temporal_kernel=8, temporal_stride=4,
        gaussian_smooth_width=2.0, conv_kernel=5, use_spec_augment=False,
        drop_path_prob=0.0, head_dropout=0.0, causal=True,
        attn_left_context=6,
    )
    params = init_conformer_params(jax.random.key(seed), cfg=cfg)
    return params, cfg


def _conf_offline(params, cfg, x):
    from neural_speech_decoder_tpu.models.conformer import conformer_forward

    logp, _, _ = conformer_forward(
        params, cfg, jnp.asarray(x), jnp.asarray([0] * x.shape[0]),
        None, train=False, key=None,
    )
    n = (x.shape[1] - cfg.temporal_kernel) // cfg.temporal_stride
    return np.asarray(logp)[:, :n]


@pytest.mark.parametrize("feed", [3, 8, 29])
def test_exported_conformer_streamer_matches_offline(tmp_path, feed):
    from neural_speech_decoder_tpu.serving import (
        export_streaming_conformer_params, load_exported_streamer,
    )

    params, cfg = _conf_stream_model()
    art = export_streaming_conformer_params(
        params, cfg, str(tmp_path / "cart"), day_idx=0, batch=2,
        frames_per_chunk=2,
    )
    st = load_exported_streamer(art)
    assert st.meta["kind"] == "conformer_stream"

    rng = np.random.default_rng(1)
    t = 75
    x = rng.standard_normal((2, t, cfg.n_channels)).astype(np.float32)
    offline = _conf_offline(params, cfg, x)

    got = [st.feed(x[:, i : i + feed]) for i in range(0, t, feed)]
    got.append(st.flush())
    streamed = np.concatenate(got, axis=1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_exported_conformer_streamer_matches_live(tmp_path):
    from neural_speech_decoder_tpu.serving import (
        export_streaming_conformer_params, load_exported_streamer,
    )
    from neural_speech_decoder_tpu.streaming.conformer import (
        ConformerStreamer,
    )

    params, cfg = _conf_stream_model(seed=3)
    art = export_streaming_conformer_params(
        params, cfg, str(tmp_path / "cart"), day_idx=1, batch=1,
        frames_per_chunk=1,
    )
    exp = load_exported_streamer(art)
    live = ConformerStreamer(params, cfg, 1, batch=1, frames_per_chunk=1)

    rng = np.random.default_rng(4)
    t = 57
    x = rng.standard_normal((1, t, cfg.n_channels)).astype(np.float32)
    ea, la = [], []
    for i in range(0, t, 6):
        ea.append(exp.feed(x[:, i : i + 6]))
        la.append(live.process(x[:, i : i + 6]))
    ea.append(exp.flush()); la.append(live.flush())
    ea = np.concatenate(ea, axis=1); la = np.concatenate(la, axis=1)
    assert ea.shape == la.shape
    np.testing.assert_allclose(ea, la, atol=1e-4)


def test_exported_conformer_streamer_unbounded_pe_soak(tmp_path):
    """Round-5: exported sessions have NO PE length cap. An artifact
    exported with a tiny max_pos_len=8 streams far past that boundary and
    still matches the offline forward (run with a big table) — the
    exported graph computes PE on the fly (sinusoidal_pos_rows)."""
    from neural_speech_decoder_tpu.serving import (
        export_streaming_conformer_params, load_exported_streamer,
    )

    params, cfg = _conf_stream_model()
    import dataclasses

    small = dataclasses.replace(cfg, max_pos_len=8)
    art = export_streaming_conformer_params(
        params, small, str(tmp_path / "cart"), batch=1, frames_per_chunk=2,
    )
    st = load_exported_streamer(art)
    assert st.meta["pe_unbounded"] is True
    rng = np.random.default_rng(0)
    t = 168  # -> 40 encoder frames, 5x the exported table bound
    x = rng.standard_normal((1, t, cfg.n_channels)).astype(np.float32)
    out = []
    for i in range(0, t, 8):
        out.append(st.feed(x[:, i : i + 8]))
    out.append(st.flush())
    streamed = np.concatenate(out, axis=1)
    big = dataclasses.replace(cfg, max_pos_len=256)
    offline = _conf_offline(params, big, x)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_export_cli_both_modes(tmp_path):
    """The packaged nsd-export CLI drives both artifact kinds."""
    from neural_speech_decoder_tpu.serving.cli import main as cli
    from neural_speech_decoder_tpu.serving import (
        load_exported, load_exported_streamer,
    )

    run_dir = _train(tmp_path, dict(GRU_ARGS, bidirectional=False))
    cli([run_dir, str(tmp_path / "a1"), "--batch-size", "2",
         "--t-max", "48"])
    m = load_exported(str(tmp_path / "a1"))
    assert m.meta["batch_size"] == 2 and m.meta["t_max"] == 48

    cli([run_dir, str(tmp_path / "a2"), "--streaming",
         "--frames-per-chunk", "2"])
    st = load_exported_streamer(str(tmp_path / "a2"))
    assert st.meta["kind"] == "gru_stream"
    assert st.meta["frames_per_chunk"] == 2


def test_exported_streamer_bf16_roundtrip(tmp_path):
    """bfloat16 checkpoints export and reload (npz stores f32 + dtype
    tag); exported streaming matches the live bf16 streamer."""
    import dataclasses

    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported_streamer,
    )
    from neural_speech_decoder_tpu.streaming.engine import GRUStreamer

    params, cfg = _stream_model(seed=11)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    art = export_streaming_params(
        params, cfg, str(tmp_path / "sart"), day_idx=0, batch=1,
        frames_per_chunk=1,
    )
    st = load_exported_streamer(art)
    assert "bfloat16" in st.meta["leaf_dtypes"]
    live = GRUStreamer(params, cfg, 0, batch=1, frames_per_chunk=1)

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 36, cfg.neural_dim)).astype(np.float32)
    a = np.concatenate([st.feed(x), st.flush()], axis=1)
    b = np.concatenate([live.process(x), live.flush()], axis=1)
    assert a.shape == b.shape and np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=5e-2)  # bf16 round-off


def test_loader_kind_errors(tmp_path):
    """Loading a batch artifact as a streamer (or vice versa) fails
    loudly, not with a shape crash deep inside jax."""
    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported, load_exported_streamer,
    )

    params, cfg = _stream_model()
    art = export_streaming_params(params, cfg, str(tmp_path / "sart"))
    with pytest.raises(Exception):
        load_exported(art)  # missing model.shlo/meta.json
    run_dir = _train(tmp_path, GRU_ARGS)
    from neural_speech_decoder_tpu.serving import export_inference

    bart = export_inference(run_dir, str(tmp_path / "bart"),
                            batch_size=2, t_max=48)
    with pytest.raises(Exception):
        load_exported_streamer(bart)  # missing stream_meta.json


def test_exported_conformer_tail_flush_exact(tmp_path):
    """frames_per_chunk=4 with a target not divisible by 4 exercises the
    exported 1-frame tail step; still exact vs offline."""
    from neural_speech_decoder_tpu.serving import (
        export_streaming_conformer_params, load_exported_streamer,
    )

    params, cfg = _conf_stream_model(seed=5)
    art = export_streaming_conformer_params(
        params, cfg, str(tmp_path / "cart"), batch=1, frames_per_chunk=4,
    )
    st = load_exported_streamer(art)
    assert st.meta["has_tail"]
    rng = np.random.default_rng(7)
    t = 70  # target = (70-8)//4 = 15 = 3*4 + 3 -> tail emits 3
    x = rng.standard_normal((1, t, cfg.n_channels)).astype(np.float32)
    streamed = np.concatenate([st.feed(x), st.flush()], axis=1)
    offline = _conf_offline(params, cfg, x)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_exported_conformer_tail_respects_pe_budget(tmp_path):
    """An utterance whose last frames sit in the final partial
    frames_per_chunk window below max_pos_len must flush via the tail
    step instead of spuriously raising (the live streamer's emit(1)
    behavior)."""
    import dataclasses

    from neural_speech_decoder_tpu.serving import (
        export_streaming_conformer_params, load_exported_streamer,
    )

    params, cfg = _conf_stream_model(seed=6)
    # 14 = the offline unfold's frame count for t=60 (one more than the
    # realized CTC length 13, the (T-k)//s vs floor+1 quirk)
    cfg = dataclasses.replace(cfg, max_pos_len=14)
    art = export_streaming_conformer_params(
        params, cfg, str(tmp_path / "cart"), batch=1, frames_per_chunk=4,
    )
    st = load_exported_streamer(art)
    # target = (60-8)//4 = 13: needs 3 chunk dispatches (12 frames) + 1
    # tail frame; a 4-frame dispatch at offset 12 would exceed the table
    t = 60
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, t, cfg.n_channels)).astype(np.float32)
    streamed = np.concatenate([st.feed(x), st.flush()], axis=1)
    assert streamed.shape[1] == 13
    offline = _conf_offline(params, cfg, x)
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


# -- exported on-device beam -------------------------------------------------

def test_exported_beam_matches_live_beam(tmp_path):
    """Exported beam blobs vs the live GRUStreamer.decode_beam on the
    same stream: identical n-best prefixes/lens, matching scores."""
    from neural_speech_decoder_tpu.serving import (
        export_beam, export_streaming_params, load_exported_streamer,
    )
    from neural_speech_decoder_tpu.streaming.engine import GRUStreamer

    params, cfg = _stream_model(seed=12)
    art = export_streaming_params(
        params, cfg, str(tmp_path / "sart"), day_idx=0, batch=2,
        frames_per_chunk=2,
    )
    export_beam(art, batch=2, n_classes=cfg.n_out, beam_width=4,
                top_k_tokens=4, max_len=32)
    exp = load_exported_streamer(art)
    assert exp.beam_meta["beam_width"] == 4
    live = GRUStreamer(params, cfg, 0, batch=2, frames_per_chunk=2)

    rng = np.random.default_rng(13)
    t = 49
    x = rng.standard_normal((2, t, cfg.neural_dim)).astype(np.float32)
    for i in range(0, t, 8):
        e_logits = exp.feed(x[:, i : i + 8])
        l_logits = live.process(x[:, i : i + 8])
        e_res = exp.decode_beam(e_logits)
        l_res = live.decode_beam(jnp.asarray(l_logits), beam_width=4,
                                 top_k_tokens=4, max_len=32)
    e_res = exp.decode_beam(exp.flush())
    l_res = live.decode_beam(jnp.asarray(live.flush()), beam_width=4,
                             top_k_tokens=4, max_len=32)
    ep, el, es = e_res
    lp_, ll, ls = (np.asarray(a) for a in l_res)
    np.testing.assert_array_equal(el, ll)
    for bi in range(2):
        for w in range(4):
            np.testing.assert_array_equal(
                ep[bi, w, : el[bi, w]], lp_[bi, w, : ll[bi, w]]
            )
    np.testing.assert_allclose(es, ls, atol=1e-4)


def test_exported_beam_requires_blobs(tmp_path):
    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported_streamer,
    )

    params, cfg = _stream_model()
    art = export_streaming_params(params, cfg, str(tmp_path / "sart"))
    st = load_exported_streamer(art)
    with pytest.raises(RuntimeError, match="beam"):
        st.decode_beam(np.zeros((1, 1, cfg.n_out), np.float32))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exported_streamer_fuzz_chunk_patterns(tmp_path, seed):
    """Random chunk sizes + random flush point: exported streamer ==
    offline on every pattern (the live streamers' differential-fuzz
    analog)."""
    from neural_speech_decoder_tpu.models.gru import gru_forward
    from neural_speech_decoder_tpu.serving import (
        export_streaming_params, load_exported_streamer,
    )

    params, cfg = _stream_model(seed=20 + seed)
    art = export_streaming_params(
        params, cfg, str(tmp_path / "sart"), day_idx=seed % 3, batch=1,
        frames_per_chunk=1 + seed % 3,
    )
    st = load_exported_streamer(art)

    rng = np.random.default_rng(100 + seed)
    t = int(rng.integers(20, 90))
    x = rng.standard_normal((1, t, cfg.neural_dim)).astype(np.float32)
    offline = np.asarray(
        gru_forward(params, cfg, jnp.asarray(x),
                    jnp.asarray([seed % 3]))
    )
    ref_len = max(0, (t - cfg.kernel_len) // cfg.stride_len)

    got, i = [], 0
    while i < t:
        n = int(rng.integers(1, 12))
        got.append(st.feed(x[:, i : i + n]))
        i += n
    got.append(st.flush())
    streamed = np.concatenate(got, axis=1)
    assert streamed.shape[1] == ref_len, (t, streamed.shape, ref_len)
    if ref_len:
        np.testing.assert_allclose(streamed, offline[:, :ref_len],
                                   atol=1e-4)
