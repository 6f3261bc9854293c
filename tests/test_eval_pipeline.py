"""End-to-end competition pipeline on synthetic word-structured data."""

import math
import pickle

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import MAX_SEQ_LEN, phone_to_id
from neural_speech_decoder_tpu.decoding.beam import Hypothesis
from neural_speech_decoder_tpu.decoding.eval_competition import (
    clean_transcription,
    collect_model_outputs,
    run_pipeline,
)
from neural_speech_decoder_tpu.decoding.rescore import (
    evaluate_transcripts,
    rescore_nbest,
)

WORDS = {
    "bat": ["B", "AE", "T"],
    "cat": ["K", "AE", "T"],
    "two": ["T", "UW"],
}
LEXICON_TEXT = "\n".join(
    f"{w} {' '.join(ps)}" for w, ps in WORDS.items()
)
ARPA_TEXT = """\\data\\
ngram 1=5

\\1-grams:
-0.5\t<s>
-0.9\t</s>
-0.6\tbat
-0.6\tcat
-0.6\ttwo

\\end\\
"""


def pid(p):
    return phone_to_id(p) + 1


def word_dataset(rng, n_days=2, trials=14, n_channels=24, scale=4.0):
    """Synthetic dataset whose labels are lexicon words + SIL."""
    templates = rng.standard_normal((41, n_channels)).astype(np.float32)
    words = list(WORDS)

    def day(n):
        sd, ph, pl, tr = [], [], [], []
        for _ in range(n):
            ws = [words[rng.integers(len(words))] for _ in range(2)]
            ids = []
            for w in ws:
                ids += [pid(p) for p in WORDS[w]]
                ids.append(pid("SIL"))
            t_per = 6
            t = len(ids) * t_per
            x = 0.4 * rng.standard_normal((t, n_channels)).astype(np.float32)
            for j, c in enumerate(ids):
                x[j * t_per : (j + 1) * t_per] += scale * templates[c]
            buf = np.zeros(MAX_SEQ_LEN, np.int32)
            buf[: len(ids)] = ids
            sd.append(x)
            ph.append(buf)
            pl.append(len(ids))
            tr.append(" ".join(ws))
        return {
            "sentenceDat": sd,
            "phonemes": ph,
            "phoneLens": np.asarray(pl),
            "transcriptions": tr,
            "timeSeriesLens": np.asarray([x.shape[0] for x in sd]),
        }

    return {
        "train": [day(trials) for _ in range(n_days)],
        "test": [day(4) for _ in range(n_days)],
        "competition": [day(3) for _ in range(n_days)],
    }


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from neural_speech_decoder_tpu.training.trainer import train_model

    rng = np.random.default_rng(0)
    data = word_dataset(rng)
    out = str(tmp_path_factory.mktemp("run") / "model")
    args = {
        "outputDir": out,
        "dataset": data,
        "batchSize": 8,
        "lrStart": 0.01,
        "lrEnd": 0.005,
        "l2_decay": 1e-5,
        "nBatch": 250,
        "evalEvery": 50,
        "whiteNoiseSD": 0.2,
        "constantOffsetSD": 0.0,
        "gaussianSmoothWidth": 2.0,
        "nUnits": 64,
        "nLayers": 2,
        "nInputFeatures": 24,
        "nClasses": 40,
        "dropout": 0.0,
        "strideLen": 2,
        "kernelLen": 4,
        "bidirectional": True,
        "seed": 0,
        "wandb_mode": "disabled",
        "time_multiple": 16,
    }
    train_model(args)
    return out, data


def test_competition_pipeline_end_to_end(trained_run, tmp_path):
    model_path, data = trained_run
    lex = tmp_path / "lexicon.txt"
    lex.write_text(LEXICON_TEXT)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA_TEXT)

    outputs = collect_model_outputs(
        model_path, dataset=data, partition="competition", batch_size=4
    )
    n_trials = sum(len(d["transcriptions"]) for d in data["competition"])
    assert len(outputs["logits"]) == n_trials
    assert len(outputs["transcriptions"]) == n_trials

    result = run_pipeline(
        outputs,
        lexicon_path=str(lex),
        arpa_path=str(arpa),
        acoustic_scale=0.5,
        blank_penalty=math.log(7),
        nbest=10,
        beam=25.0,
        return_ci=True,
        verbose=False,
    )
    assert np.isfinite(result["wer"]) and np.isfinite(result["cer"])
    assert len(result["decoded_transcripts"]) == n_trials
    # every decoded transcript is made of lexicon words
    for t in result["decoded_transcripts"]:
        assert all(w in WORDS for w in t.split())
    # the model trained for 250 steps on a 3-word vocabulary: the
    # lexicon+LM-constrained decode should beat chance solidly
    assert result["wer"] < 0.8, result["wer"]
    assert result["per"] < 0.8, result["per"]
    assert result["wer_ci"][0] <= result["wer"] <= result["wer_ci"][1]


def test_rescore_nbest_alpha_blend():
    nb = [
        [
            Hypothesis([1], ["bat"], 0.0, ac_score=-1.0, lm_score=0.0),
            Hypothesis([2], ["cat"], 0.0, ac_score=-1.5, lm_score=0.0),
        ]
    ]
    # LLM strongly prefers "cat"
    scorer = lambda texts: [0.0 if t == "bat" else 10.0 for t in texts]
    assert rescore_nbest(nb, scorer, alpha=1.0) == ["cat"]
    assert rescore_nbest(nb, scorer, alpha=0.0) == ["bat"]
    assert rescore_nbest(nb, None) == ["bat"]


def test_evaluate_transcripts_rates():
    r = evaluate_transcripts(["the cat sat", "a dog"], ["the cat sat", "a dog"])
    assert r.wer == 0 and r.cer == 0
    r = evaluate_transcripts(["the cat"], ["the bat"])
    assert r.wer == 0.5
    assert 0 < r.cer < 0.5


def test_clean_transcription_matches_reference_rules():
    assert clean_transcription(" Hello, World!! -- ok ") == "hello world  ok"


def test_rescore_nbest_scores_unique_sentences_once():
    """The LLM leg (the expensive pass at 6.7B scale) must score each
    unique word string once, not once per hypothesis repeat."""
    nb = [
        [
            Hypothesis([1], ["bat"], 0.0, ac_score=-1.0, lm_score=0.0),
            Hypothesis([1, 1], ["bat"], 0.0, ac_score=-1.2, lm_score=0.0),
            Hypothesis([2], ["cat"], 0.0, ac_score=-1.5, lm_score=0.0),
        ],
        [
            Hypothesis([2], ["cat"], 0.0, ac_score=-0.5, lm_score=0.0),
        ],
    ]
    seen = []

    def scorer(texts):
        seen.append(list(texts))
        return [10.0 if t == "cat" else 0.0 for t in texts]

    assert rescore_nbest(nb, scorer, alpha=1.0) == ["cat", "cat"]
    assert seen == [["bat", "cat"]]  # one call, deduped, order-stable


def test_evaluate_transcripts_rejects_mismatched_pairing():
    with pytest.raises(ValueError, match="references"):
        evaluate_transcripts(["a", "b"], ["a"])


def test_day_indices_override_and_heuristic_warning(trained_run):
    model_path, data = trained_run
    n_trials = sum(len(d["transcriptions"]) for d in data["competition"])
    # explicit override: both competition days evaluated with day slot 0
    out = collect_model_outputs(
        model_path, dataset=data, partition="competition", batch_size=4,
        day_indices=[0, 0],
    )
    assert len(out["logits"]) == n_trials
    # the override must actually change the day embeddings: identity
    # mapping [0, 1] equals the default path; [0, 0] differs on the
    # second day's trials (trained day weights diverge across days)
    base = collect_model_outputs(
        model_path, dataset=data, partition="competition", batch_size=4,
    )
    ident = collect_model_outputs(
        model_path, dataset=data, partition="competition", batch_size=4,
        day_indices=[0, 1],
    )
    np.testing.assert_allclose(ident["logits"][-1], base["logits"][-1],
                               atol=1e-6)
    assert not np.allclose(out["logits"][-1], base["logits"][-1],
                           atol=1e-4)
    # mismatched override length is loud, not truncated
    with pytest.raises(ValueError, match="day_indices"):
        collect_model_outputs(
            model_path, dataset=data, partition="competition",
            day_indices=[0],
        )
    # the reference competition-calendar heuristic warns when it engages
    # (6 train days makes max([4, 5]) < n_train_days hold)
    from neural_speech_decoder_tpu.training.trainer import load_model

    params, model, _ = load_model(model_path)
    big = dict(data, train=data["train"] * 3)
    with pytest.warns(UserWarning, match="competition day mapping"):
        collect_model_outputs(
            model_path, dataset=big, partition="competition", batch_size=4,
            model_bundle=(params, model),
        )
