"""Small-scale end-to-end run of the competition-scale demo machinery:
generated ambiguity corpus -> reference-recipe training -> one-command
pipeline (forward -> WFST beam -> bigram-OPT rescore) -> the rescored WER
beats the WFST top-1 WER. The full-scale run (60k lexicon, OPT-6.7B int8
on chip, >=1k utterances) uses exactly these components."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("comp_demo"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "make_competition_scale_demo.py"),
         "--out", out, "--opt-size", "125m", "--corpus-words", "24",
         "--lexicon-words", "300", "--train-days", "3",
         "--train-per-day", "40", "--test-per-day", "8",
         "--competition-days", "3", "--competition-utts", "36",
         "--n-channels", "32", "--noise-scale", "0.6", "--seed", "7"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    manifest = json.loads(r.stdout.strip().splitlines()[-1])
    return manifest


def test_demo_artifacts_consistent(demo):
    with open(demo["dataset"], "rb") as f:
        ds = pickle.load(f)
    assert len(ds["train"]) == 3
    n_utts = sum(len(d["sentenceDat"]) for d in ds["competition"])
    assert n_utts >= 36
    # every transcription word is in the lexicon; homophone decoys exist
    lex = {}
    for line in open(demo["lexicon"]):
        w, ph = line.split(None, 1)
        lex.setdefault(w.split("(")[0], []).append(tuple(ph.split()))
    for day in ds["competition"]:
        for tr in day["transcriptions"]:
            for w in tr.split():
                assert w in lex
    prons = {}
    n_homo = 0
    for w, ps in lex.items():
        for p in ps:
            if p in prons and prons[p] != w:
                n_homo += 1
            prons.setdefault(p, w)
    assert n_homo >= demo["homophones"] // 2


def test_trained_pipeline_rescoring_beats_top1(demo, tmp_path):
    from neural_speech_decoder_tpu.decoding.eval_competition import (
        collect_model_outputs,
        run_pipeline,
    )
    from neural_speech_decoder_tpu.decoding.llm_engine import engine_scorer
    from neural_speech_decoder_tpu.training.trainer import train_model

    with open(demo["dataset"], "rb") as f:
        ds = pickle.load(f)
    run_dir = str(tmp_path / "run")
    args = {
        "outputDir": run_dir, "dataset": ds, "batchSize": 16,
        "lrStart": 0.005, "lrEnd": 0.001, "l2_decay": 1e-5,
        "nBatch": 701, "evalEvery": 350, "whiteNoiseSD": 0.1,
        "constantOffsetSD": 0.0, "gaussianSmoothWidth": 2.0,
        "nUnits": 96, "nLayers": 2, "nInputFeatures": 32, "nClasses": 40,
        "dropout": 0.0, "strideLen": 4, "kernelLen": 8,
        "bidirectional": True, "seed": 0, "wandb_mode": "disabled",
        "time_multiple": 32,
    }
    train_model(args)

    outputs = collect_model_outputs(
        run_dir, dataset=ds, partition="competition", batch_size=16,
        day_indices=[0, 1, 2],
    )
    scorer = engine_scorer(demo["opt_dir"], batch_size=8)
    result = run_pipeline(
        outputs,
        lexicon_path=demo["lexicon"],
        arpa_path=demo["arpa"],
        nbest=24,
        llm_scorer=scorer,
        return_ci=False,
    )
    print("PER", result["per"], "top1 WER", result["wer_top1"],
          "rescored WER", result["wer"])
    # the model must decode phones well enough that ambiguity is the
    # dominant error source, and rescoring must measurably resolve it
    assert result["per"] < 0.2, f"acoustic model too weak: {result}"
    assert result["wer_top1"] > 0.05, (
        f"no ambiguity constructed: {result['wer_top1']}"
    )
    assert result["wer"] < result["wer_top1"] * 0.8, (
        f"rescoring did not win: top1 {result['wer_top1']} "
        f"-> rescored {result['wer']}"
    )
    assert result["forward_seconds"] is not None
    assert result["beam_seconds"] > 0 and result["rescore_seconds"] > 0
