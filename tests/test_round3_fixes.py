"""Round-3 hardening tests (VERDICT r2 weak-items + ADVICE r2 findings).

Covers:
  * preempted train_model returns a rankable summary (sweep won't KeyError);
  * Python beam_search no longer mutates a shared Lexicon when oov_cost is on;
  * the GRU Pallas auto-gate warns (once) instead of silently degrading;
  * jax_causal_scorer warns on position-table truncation;
  * fused-attention gate rejects sequence lengths that exceed the VMEM budget.
"""

import math
import warnings

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import phone_to_id


def pid(p):
    return phone_to_id(p) + 1


SIL = 40


def logits_for(phone_ids, t_per=3, k=41, seed=0, strength=6.0):
    rng = np.random.default_rng(seed)
    frames = []
    for p in phone_ids:
        frames.extend([p] * t_per)
        frames.append(0)
    x = rng.standard_normal((len(frames), k)).astype(np.float32)
    for t, p in enumerate(frames):
        x[t, p] += strength
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_reference_spelling_aliases():
    """Reference call sites use trainModel/loadModel
    (neural_decoder_trainer.py:61,390); the package exports those
    spellings as aliases so migrating code keeps its imports verbatim."""
    import neural_speech_decoder_tpu.training as training

    assert training.trainModel is training.train_model
    assert training.loadModel is training.load_model
    assert "trainModel" in training.__all__
    assert "loadModel" in training.__all__


def test_beam_search_does_not_mutate_lexicon(tmp_path):
    from neural_speech_decoder_tpu.decoding.beam import beam_search
    from neural_speech_decoder_tpu.decoding.lexicon import Lexicon

    lex_path = tmp_path / "lex.txt"
    lex_path.write_text("cat K AE T\ndog D AO G\n")
    lex = Lexicon.from_file(str(lex_path))
    words_before = list(lex.words)
    ids_before = dict(lex.word_ids)

    seq = [pid(p) for p in ["K", "AE", "T"]] + [SIL]
    seq += [pid(p) for p in ["B", "IY", "K"]] + [SIL]
    lp = logits_for(seq)
    hyps = beam_search(
        lp, lexicon=lex, lm=None, acoustic_scale=0.5, beam=25.0,
        nbest=10, oov_cost=-2.0,
    )
    assert any("<unk>" in h.words for h in hyps)
    # the shared Lexicon is untouched (ADVICE r2: beam.py:107)
    assert lex.words == words_before
    assert lex.word_ids == ids_before


def test_pallas_gate_warns_once_on_tpu_fallback():
    import neural_speech_decoder_tpu.models.gru as gru_mod

    gru_mod._warned_pallas_fallback = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert gru_mod._pallas_scan_gate("tpu", 1024, 60) is False
        assert gru_mod._pallas_scan_gate("tpu", 1024, 60) is False  # once
    msgs = [str(w.message) for w in rec if "Pallas" in str(w.message)]
    assert len(msgs) == 1 and "batch=60" in msgs[0]

    gru_mod._warned_pallas_fallback = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert gru_mod._pallas_scan_gate("tpu", 1024, 64) is True
        assert gru_mod._pallas_scan_gate("cpu", 1024, 60) is False
    assert not [w for w in rec if "Pallas" in str(w.message)]


def test_fused_attention_gate_rejects_long_sequences(monkeypatch):
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.models import conformer as cm

    monkeypatch.setattr(cm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(cm.jax, "device_count", lambda: 1)
    cfg = cm.ConformerConfig(compute_dtype=jnp.bfloat16)
    assert (cfg.latent_dim // cfg.num_heads) % 128 == 0
    assert cm._use_fused_attention(cfg, 320, 64) is True
    # [Tp, Tp] f32 scores no longer fit scoped VMEM → einsum fallback
    assert cm._use_fused_attention(cfg, 4096, 64) is False


def test_preempted_summary_is_rankable(monkeypatch, tmp_path):
    """parallel/sweep.py ranks trials by summary['summary/best_cer']; a
    preempted train_model return must rank — and be recorded with its own
    'preempted' status, not 'failed' (ADVICE r2, medium). The real
    preempted summary's shape (preempted_at + finite best_cer) is pinned
    by test_preemption.py::test_signal_checkpoints_and_resumes; here the
    sweep driver consumes exactly that shape."""
    from neural_speech_decoder_tpu.parallel import sweep as sweep_mod
    from neural_speech_decoder_tpu.training import trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod, "train_model",
        lambda args: {"summary/preempted_at": 7, "summary/best_cer": 0.5},
    )
    done = sweep_mod._run_trial(
        {}, sweep_mod.Trial(0, {}, str(tmp_path / "t0"))
    )
    assert done.status == "preempted"
    assert done.best_cer == 0.5
    assert done.error is None

    # an un-preempted summary still records as 'done'
    monkeypatch.setattr(
        trainer_mod, "train_model",
        lambda args: {"summary/best_cer": 0.25, "summary/final_cer": 0.3},
    )
    done = sweep_mod._run_trial(
        {}, sweep_mod.Trial(1, {}, str(tmp_path / "t1"))
    )
    assert done.status == "done" and done.best_cer == 0.25


def test_large_opt_auto_routing(tmp_path):
    """The competition CLI routes >1B-param OPT checkpoints to the
    streamed reference-scale engine and small/other models to jax_lm."""
    import json

    from neural_speech_decoder_tpu.decoding.eval_competition import (
        _is_large_opt,
    )

    def cfg_dir(name, payload):
        d = tmp_path / name
        d.mkdir()
        (d / "config.json").write_text(json.dumps(payload))
        return str(d)

    big = cfg_dir("opt67b", {"model_type": "opt", "hidden_size": 4096,
                             "ffn_dim": 16384, "num_hidden_layers": 32})
    small = cfg_dir("opt125m", {"model_type": "opt", "hidden_size": 768,
                                "ffn_dim": 3072, "num_hidden_layers": 12})
    gpt2 = cfg_dir("gpt2", {"model_type": "gpt2"})
    assert _is_large_opt(big) is True
    assert _is_large_opt(small) is False
    assert _is_large_opt(gpt2) is False
    assert _is_large_opt(str(tmp_path / "missing")) is False


def test_jax_scorer_truncation_warns():
    """Over-long sentences warn (and are truncated to the position table)
    instead of silently scoring a prefix — exercised through the shared
    host loop both scorers use (jax_lm.make_batched_scorer)."""
    from neural_speech_decoder_tpu.decoding.jax_lm import make_batched_scorer

    def tok(chunk, padding=True):
        rows = [[1] * max(len(s.split()), 1) for s in chunk]
        t = max(len(r) for r in rows)
        return {
            "input_ids": [r + [0] * (t - len(r)) for r in rows],
            "attention_mask": [
                [1] * len(r) + [0] * (t - len(r)) for r in rows
            ],
        }

    shapes = []

    def score_batch(ids, mask):
        shapes.append(ids.shape)
        return np.arange(ids.shape[0], dtype=np.float32)

    score = make_batched_scorer(
        tok, n_positions=8, score_batch=score_batch,
        batch_size=4, length_multiple=4,
    )
    # in-range sentences: no warning, padded to the length bucket
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert score(["a b c", "d e"]) == [0.0, 1.0]
    assert shapes[-1] == (4, 4)
    # 12-token sentence > 8-position table: warns, scores the 8-prefix
    with pytest.warns(UserWarning, match="position table"):
        score(["w " * 12])
    assert shapes[-1] == (4, 8)


def test_ctc_lengths_clamp_sub_kernel_utterances():
    """Utterances shorter than the unfold kernel must yield CTC length 0,
    not a negative value that poisons ctc_loss and the pad mask."""
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        conformer_output_lengths,
    )
    from neural_speech_decoder_tpu.ops.unfold import ctc_input_lengths

    lens = jnp.asarray([21, 31, 32, 33, 100], jnp.int32)
    out = np.asarray(ctc_input_lengths(lens, 32, 4))
    np.testing.assert_array_equal(out, [0, 0, 0, 0, 17])

    cfg = ConformerConfig(temporal_kernel=32, temporal_stride=4)
    out = np.asarray(conformer_output_lengths(cfg, lens, 100))
    np.testing.assert_array_equal(out, [0, 0, 0, 0, 17])


def test_sinusoidal_pos_encoding_odd_dim():
    from neural_speech_decoder_tpu.models.conformer import (
        sinusoidal_pos_encoding,
    )

    for d in (7, 129):
        pe = np.asarray(sinusoidal_pos_encoding(16, d))
        assert pe.shape == (16, d)
        assert np.all(np.isfinite(pe))
        # even (sin) track has ceil(d/2) columns, odd (cos) track d//2
        np.testing.assert_allclose(pe[0, 0::2], 0.0)  # sin(0)
        np.testing.assert_allclose(pe[0, 1::2], 1.0)  # cos(0)
