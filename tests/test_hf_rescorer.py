"""LLM rescoring through a real (tiny, locally built) HF causal LM.

The reference rescores n-best lists with OPT-6.7B (eval_competition.py:
84-86,127-137); this exercises the same integration path with a randomly
initialized 2-layer GPT-2 saved to disk — no network, real tokenizer-free
scoring via a character-level vocab is avoided by building a minimal
tokenizer from GPT2's config defaults.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_lm(tmp_path_factory):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel, GPT2TokenizerFast

    d = tmp_path_factory.mktemp("tiny_lm")
    # minimal char-ish vocab + merges for a functional GPT2 tokenizer
    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    vocab.update({" ": 26, "<|endoftext|>": 27, "Ġ": 28})
    import json

    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = GPT2TokenizerFast(
        vocab_file=str(d / "vocab.json"),
        merges_file=str(d / "merges.txt"),
        unk_token="<|endoftext|>",
        pad_token="<|endoftext|>",
    )
    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=len(vocab), n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    model = GPT2LMHeadModel(cfg)
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    return str(d)


def test_hf_scorer_scores_sentences(tiny_lm):
    from neural_speech_decoder_tpu.decoding.rescore import hf_causal_scorer

    scorer = hf_causal_scorer(tiny_lm)
    scores = scorer(["the cat", "a", "hello world again"])
    assert len(scores) == 3
    assert all(np.isfinite(s) and s <= 0 for s in scores)
    # longer text accumulates more (negative) log prob than a single char
    assert scores[2] < scores[1]


def test_rescore_nbest_with_hf_scorer(tiny_lm):
    from neural_speech_decoder_tpu.decoding.beam import Hypothesis
    from neural_speech_decoder_tpu.decoding.rescore import (
        hf_causal_scorer,
        rescore_nbest,
    )

    scorer = hf_causal_scorer(tiny_lm)
    nb = [
        [
            Hypothesis([1], ["bat"], 0.0, ac_score=-1.0, lm_score=0.0),
            Hypothesis([2], ["cat"], 0.0, ac_score=-1.2, lm_score=0.0),
        ]
    ]
    out = rescore_nbest(nb, scorer, alpha=0.5)
    assert out[0] in ("bat", "cat")
