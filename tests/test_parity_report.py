"""CI test for the one-command real-data parity rehearsal.

Builds a synthetic ``formatCompetitionData``-layout directory (raw ``.mat``
sessions) plus a synthetic reference-shaped torch checkpoint, then runs
``scripts/parity_report.py`` end-to-end: format → torch-import →
fp32 logit diff vs the actual reference forward (/root/reference used as a
numerical oracle) → greedy PER → beam+LM WER. Proves the entire
docs/REAL_DATA.md recipe is executable as one command.
"""

import json
import math
import os
import sys

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")
torch = pytest.importorskip("torch")

import scipy.io

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)


def make_mat(path, n_trials=3, t=40, seed=0):
    rng = np.random.default_rng(seed)
    tx1 = np.empty((1, n_trials), object)
    spike_pow = np.empty((1, n_trials), object)
    for i in range(n_trials):
        tx1[0, i] = rng.standard_normal((t, 192))
        spike_pow[0, i] = rng.standard_normal((t, 192))
    sentences = np.array(["go home now", "yes sir", "no way"])[:n_trials]
    scipy.io.savemat(str(path), {
        "tx1": tx1,
        "spikePow": spike_pow,
        "sentenceText": sentences,
        "blockIdx": np.ones((n_trials, 1)),
    })


def stub_g2p(text):
    out = []
    for i, w in enumerate(text.split(" ")):
        if i:
            out.append(" ")
        out.extend(["B1", "AE0"] if w else [])
    return out


@pytest.fixture
def data_dir(tmp_path):
    d = tmp_path / "competitionData"
    for split in ("train", "test", "competitionHoldOut"):
        (d / split).mkdir(parents=True)
        for sess in ("s1", "s2"):
            make_mat(d / split / f"{sess}.mat",
                     seed=hash((split, sess)) % 2**31)
    return str(d)


@pytest.fixture
def ref_checkpoint(tmp_path):
    """Reference-shaped GRU state dict (tiny dims) saved like the
    reference trainer does (neural_decoder_trainer.py:352-358)."""
    torch.manual_seed(0)
    n_days, c, h, k, layers, dirs = 2, 256, 32, 8, 2, 2
    sd = {
        "dayWeights": torch.stack([torch.eye(c) for _ in range(n_days)]),
        "dayBias": torch.zeros(n_days, 1, c),
        "fc_decoder_out.weight": torch.randn(41, h * dirs) * 0.05,
        "fc_decoder_out.bias": torch.zeros(41),
    }
    for li in range(layers):
        in_dim = c * k if li == 0 else h * dirs
        for sfx in (f"l{li}", f"l{li}_reverse"):
            sd[f"gru_decoder.weight_ih_{sfx}"] = (
                torch.randn(3 * h, in_dim) * 0.02
            )
            sd[f"gru_decoder.weight_hh_{sfx}"] = torch.randn(3 * h, h) * 0.02
            sd[f"gru_decoder.bias_ih_{sfx}"] = torch.zeros(3 * h)
            sd[f"gru_decoder.bias_hh_{sfx}"] = torch.zeros(3 * h)
    run_dir = tmp_path / "ref_run"
    run_dir.mkdir()
    torch.save(sd, str(run_dir / "modelWeights"))
    import pickle

    with open(run_dir / "args", "wb") as f:
        pickle.dump({"strideLen": 4, "gaussianSmoothWidth": 2.0}, f)
    return str(run_dir / "modelWeights")


def _decode_artifacts(tmp_path):
    lex = tmp_path / "lex.txt"
    lex.write_text("bay B AE\n")  # stub_g2p maps every word to B AE
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=4\n\n\\1-grams:\n"
        "-0.5\t<s>\n-0.5\t</s>\n-0.5\t<unk>\n-0.3\tbay\n\n\\end\\\n"
    )
    return str(lex), str(arpa)


def test_parity_report_end_to_end(data_dir, ref_checkpoint, tmp_path,
                                  monkeypatch):
    from neural_speech_decoder_tpu.data import formatter

    monkeypatch.setattr(formatter, "make_g2p", lambda: stub_g2p)

    import parity_report

    lex, arpa = _decode_artifacts(tmp_path)
    out = str(tmp_path / "report.json")
    argv = [
        "--checkpoint", ref_checkpoint,
        "--data-dir", data_dir,
        "--lexicon", lex,
        "--lm", arpa,
        "--out", out,
    ]
    if os.path.isdir("/root/reference/src"):
        argv += ["--reference-src", "/root/reference/src"]
    report = parity_report.main(argv)

    # format leg ran and produced the pickle
    assert report["formatted_sessions"] == 2
    assert os.path.exists(os.path.join(data_dir, "ptDecoder_ctc"))
    # config inferred from the state-dict shapes
    assert report["model_args"] == {
        "nInputFeatures": 256, "nUnits": 32, "nLayers": 2,
        "bidirectional": True, "kernelLen": 8, "strideLen": 4,
        "nClasses": 40, "nDays": 2,
    }
    # logit-diff leg (reference oracle available in CI)
    if os.path.isdir("/root/reference/src"):
        assert report["logit_max_abs_diff"] < 1e-4
        assert report["logit_trials_compared"] > 0
    # PER leg: random weights → PER near/above chance but finite
    assert math.isfinite(report["test_per"])
    # WER leg ran over the competition partition
    assert report["wer_partition"] == "competition"
    assert math.isfinite(report["wer"])
    # report artifact written
    with open(out) as f:
        assert json.load(f)["test_per"] == report["test_per"]


def test_parity_report_from_pickle(ref_checkpoint, tmp_path, monkeypatch):
    """--dataset (pre-formatted pickle) path, no decode artifacts."""
    import pickle

    from neural_speech_decoder_tpu.data import formatter

    monkeypatch.setattr(formatter, "make_g2p", lambda: stub_g2p)

    # build a tiny formatted dataset directly
    rng = np.random.default_rng(0)

    def day(n=3, t=40):
        phon = []
        for _ in range(n):
            ids = np.zeros(500, np.int32)
            ids[:3] = [2, 1, 40]
            phon.append(ids)
        return {
            "sentenceDat": [
                rng.standard_normal((t, 256)).astype(np.float32)
                for _ in range(n)
            ],
            "transcriptions": ["bay"] * n,
            "phonemes": phon,
            "timeSeriesLens": np.full(n, t),
            "phoneLens": np.full(n, 3),
            "phonePerTime": np.full(n, 3 / t, np.float32),
        }

    ds = {"train": [day(), day()], "test": [day(), day()],
          "competition": []}
    pkl = tmp_path / "ds.pickle"
    with open(pkl, "wb") as f:
        pickle.dump(ds, f)

    import parity_report

    report = parity_report.main(
        ["--checkpoint", ref_checkpoint, "--dataset", str(pkl)]
    )
    assert math.isfinite(report["test_per"])
    assert "wer" not in report
