"""Data formatter golden tests: .mat sessions -> formatted dataset.

Verifies the notebook-formatter behaviors (cells 2-3) on synthetic .mat
fixtures: 6v channel slicing/concatenation, block-wise z-scoring with eps
1e-8 over contiguous block spans, transcription cleanup, SIL policy, +1 ID
offset and the 500-slot label buffer. g2p_en is not installed here, so a
deterministic stub g2p exercises the phonemization policy.
"""

import numpy as np
import pytest
import scipy.io

from neural_speech_decoder_tpu.data.formatter import (
    clean_transcription,
    format_session,
    labels_from_phonemes,
    load_features_and_normalize,
    phonemize,
)
from neural_speech_decoder_tpu.data.phonemes import MAX_SEQ_LEN, phone_to_id


def make_mat(tmp_path, n_trials=4, t=30, blocks=(1, 1, 2, 2)):
    rng = np.random.default_rng(0)
    tx1 = np.empty((1, n_trials), object)
    spike_pow = np.empty((1, n_trials), object)
    for i in range(n_trials):
        # more than 128 columns: formatter must slice [:, :128]
        tx1[0, i] = rng.standard_normal((t, 192)).astype(np.float64)
        spike_pow[0, i] = rng.standard_normal((t, 192)).astype(np.float64)
    sentences = np.array(["Go home now.", "It's fine!", "yes", "no way"])
    mat = {
        "tx1": tx1,
        "spikePow": spike_pow,
        "sentenceText": sentences,
        "blockIdx": np.array(blocks).reshape(-1, 1),
    }
    path = tmp_path / "session.mat"
    scipy.io.savemat(str(path), mat)
    return str(path), tx1, spike_pow, blocks


def stub_g2p(text):
    """Deterministic g2p stand-in: maps each word to [B, AE] + emits spaces
    (the reference's g2p yields phone tokens and literal spaces)."""
    out = []
    words = text.split(" ")
    for i, w in enumerate(words):
        if i:
            out.append(" ")
        out.extend(["B1", "AE0"] if w else [])
    return out


def test_load_features_shapes_and_blockwise_zscore(tmp_path):
    path, tx1, spike_pow, blocks = make_mat(tmp_path)
    session = load_features_and_normalize(path)
    feats = session["inputFeatures"]
    assert len(feats) == 4
    assert feats[0].shape == (30, 256)

    # manual recomputation for block 1 (trials 0-1)
    raw = [
        np.concatenate([tx1[0, i][:, :128], spike_pow[0, i][:, :128]], axis=1)
        for i in range(4)
    ]
    span = np.concatenate(raw[0:2], axis=0)
    mean, std = span.mean(0, keepdims=True), span.std(0, keepdims=True)
    expect0 = (raw[0] - mean) / (std + 1e-8)
    np.testing.assert_allclose(feats[0], expect0, rtol=1e-6)
    # block 2 normalized independently
    span2 = np.concatenate(raw[2:4], axis=0)
    mean2, std2 = span2.mean(0, keepdims=True), span2.std(0, keepdims=True)
    np.testing.assert_allclose(
        feats[3], (raw[3] - mean2) / (std2 + 1e-8), rtol=1e-6
    )


def test_clean_transcription():
    assert clean_transcription("It's fine!") == "it's fine"
    assert clean_transcription("Go -- home.") == "go  home"
    assert clean_transcription("A1B2C3") == "abc"


def test_phonemize_sil_policy():
    phones = phonemize("go home", stub_g2p)
    # spaces -> SIL, stress digits stripped, trailing SIL appended
    assert phones == ["B", "AE", "SIL", "B", "AE", "SIL"]


def test_labels_buffer_and_offset():
    ids = labels_from_phonemes(["B", "AE", "SIL"])
    assert ids.shape == (MAX_SEQ_LEN,)
    assert ids[0] == phone_to_id("B") + 1
    assert ids[2] == phone_to_id("SIL") + 1 == 40
    assert (ids[3:] == 0).all()


def test_labels_overflow_truncates_with_warning():
    import warnings as w

    phones = ["B", "AE"] * 300  # 600 > MAX_SEQ_LEN
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        ids = labels_from_phonemes(phones)
    assert rec and "truncated" in str(rec[0].message)
    assert ids.shape == (MAX_SEQ_LEN,)
    assert ids[MAX_SEQ_LEN - 1] == 0  # terminating zero always present
    assert (ids[: MAX_SEQ_LEN - 1] > 0).all()


def test_format_session_schema(tmp_path):
    path, *_ = make_mat(tmp_path)
    day = format_session(path, stub_g2p)
    assert set(day) == {
        "sentenceDat", "transcriptions", "phonemes", "timeSeriesLens",
        "phoneLens", "phonePerTime",
    }
    assert len(day["sentenceDat"]) == 4
    # "Go home now." -> 3 words -> 6 phones + 2 inter-word SIL + final SIL = 9
    assert day["phoneLens"][0] == 9
    np.testing.assert_allclose(
        day["phonePerTime"],
        day["phoneLens"] / day["timeSeriesLens"].astype(np.float32),
    )
    # loadable by the packed dataset layer
    from neural_speech_decoder_tpu.data.dataset import pack_days

    ds = pack_days([day])
    assert ds.n_trials == 4 and ds.n_channels == 256
