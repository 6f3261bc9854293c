"""End-to-end PER regression on formatter-produced data (SURVEY §4(f)).

Synthesizes raw ``.mat`` sessions whose neural features are phone-locked
(each phone has a fixed channel signature), runs them through the REAL
data formatter (block z-score, stub G2P + SIL policy, +1 IDs), trains the
GRU briefly on the formatted output, and asserts the greedy PER drops
well below chance — the full data path from ``.mat`` bytes to a learning
model, with no synthetic-dataset shortcut.
"""

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")
import scipy.io

from neural_speech_decoder_tpu.data import formatter

WORDS = {"bay": ["B", "AE"], "key": ["K", "IY"], "paw": ["D", "AO"]}
PHONES = sorted({p for ph in WORDS.values() for p in ph})


def stub_g2p(text):
    out = []
    for i, w in enumerate(text.split(" ")):
        if i:
            out.append(" ")
        out.extend(WORDS.get(w, []))
    return out


def make_session(path, n_trials, seed, t_per_phone=10, n_cols=192):
    """Write one .mat session with phone-locked features."""
    rng = np.random.default_rng(seed)
    sig_rng = np.random.default_rng(0)  # signatures shared across sessions
    sigs = {
        p: sig_rng.standard_normal(n_cols) * 2.0
        for p in PHONES + ["SIL"]
    }
    tx1 = np.empty((1, n_trials), object)
    spike_pow = np.empty((1, n_trials), object)
    sentences = []
    vocab = list(WORDS)
    for i in range(n_trials):
        words = [vocab[rng.integers(len(vocab))]
                 for _ in range(rng.integers(2, 5))]
        sentences.append(" ".join(words))
        seq = []
        for j, w in enumerate(words):
            if j:
                seq.append("SIL")
            seq.extend(WORDS[w])
        seq.append("SIL")
        frames = []
        for p in seq:
            block = sigs[p][None, :] + rng.standard_normal(
                (t_per_phone, n_cols)
            ) * 0.5
            frames.append(block)
        feats = np.concatenate(frames, axis=0)
        tx1[0, i] = feats
        spike_pow[0, i] = feats + rng.standard_normal(feats.shape) * 0.3
    scipy.io.savemat(str(path), {
        "tx1": tx1,
        "spikePow": spike_pow,
        "sentenceText": np.array(sentences),
        "blockIdx": np.ones((n_trials, 1)),
    })


@pytest.mark.slow
def test_formatted_data_trains(tmp_path, monkeypatch):
    monkeypatch.setattr(formatter, "make_g2p", lambda: stub_g2p)
    g2p = stub_g2p
    days_train, days_test = [], []
    for d in range(2):
        p_tr = tmp_path / f"train_{d}.mat"
        p_te = tmp_path / f"test_{d}.mat"
        make_session(p_tr, n_trials=24, seed=100 + d)
        make_session(p_te, n_trials=8, seed=200 + d)
        days_train.append(formatter.format_session(str(p_tr), g2p))
        days_test.append(formatter.format_session(str(p_te), g2p))

    # formatted schema sanity (reference day-dict contract)
    day = days_train[0]
    assert day["sentenceDat"][0].shape[1] == 256  # 128 tx1 + 128 spikePow
    assert day["phonemes"][0].dtype == np.int32
    assert int(day["phoneLens"][0]) > 0

    from neural_speech_decoder_tpu.training import train_model

    summary = train_model({
        "outputDir": str(tmp_path / "run"),
        "dataset": {"train": days_train, "test": days_test},
        "batchSize": 8,
        "lrStart": 0.005, "lrEnd": 0.002, "l2_decay": 1e-5,
        "nBatch": 401, "evalEvery": 100,
        "whiteNoiseSD": 0.1, "constantOffsetSD": 0.0,
        "gaussianSmoothWidth": 2.0,
        "nUnits": 64, "nLayers": 2, "nInputFeatures": 256,
        "nClasses": 40, "dropout": 0.0,
        "strideLen": 4, "kernelLen": 8, "bidirectional": True,
        "seed": 0, "wandb_mode": "disabled", "time_multiple": 32,
    })
    # chance-level greedy PER on this task is >= 1.0 (dense insertions at
    # init); phone-locked signatures should be learned quickly
    assert summary["summary/best_cer"] < 0.55, summary
