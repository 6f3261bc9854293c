"""Parity of the TPU-native (pure-JAX) causal-LM rescorer vs the torch HF
scorer, for both supported checkpoint families (GPT-2, OPT).

The reference's rescoring pass is OPT-6.7B via torch on GPU
(eval_competition.py:84-86,125-137); `decoding/jax_lm.py` runs the same
scoring as a jitted JAX forward. These tests pin fp32 sentence-logprob
parity on tiny randomly-initialized local checkpoints (no network), so the
weight conversion (Conv1D vs Linear layouts, fused qkv packing, positional
offsets) and the forward math are both checked.
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

SENTENCES = ["the cat sat", "a", "hello world again and again", ""]


def _tiny_tokenizer(d):
    from transformers import GPT2TokenizerFast

    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    vocab.update({" ": 26, "<|endoftext|>": 27, "Ġ": 28})
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return GPT2TokenizerFast(
        vocab_file=str(d / "vocab.json"),
        merges_file=str(d / "merges.txt"),
        unk_token="<|endoftext|>",
        pad_token="<|endoftext|>",
        bos_token="<|endoftext|>",
        eos_token="<|endoftext|>",
    ), len(vocab)


@pytest.fixture(scope="module")
def tiny_gpt2(tmp_path_factory):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    d = tmp_path_factory.mktemp("tiny_gpt2")
    tok, vocab_size = _tiny_tokenizer(d)
    torch.manual_seed(0)
    model = GPT2LMHeadModel(
        GPT2Config(
            vocab_size=vocab_size, n_positions=64, n_embd=32, n_layer=3,
            n_head=2,
        )
    )
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def tiny_opt(tmp_path_factory):
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    d = tmp_path_factory.mktemp("tiny_opt")
    tok, vocab_size = _tiny_tokenizer(d)
    torch.manual_seed(1)
    model = OPTForCausalLM(
        OPTConfig(
            vocab_size=vocab_size, hidden_size=32, num_hidden_layers=3,
            num_attention_heads=2, ffn_dim=64, max_position_embeddings=64,
            word_embed_proj_dim=32, do_layer_norm_before=True,
            pad_token_id=27, bos_token_id=27, eos_token_id=27,
        )
    )
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def tiny_opt_projected(tmp_path_factory):
    """OPT-350m-style word/hidden dim split (project_in/project_out)."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    d = tmp_path_factory.mktemp("tiny_opt_proj")
    tok, vocab_size = _tiny_tokenizer(d)
    torch.manual_seed(2)
    model = OPTForCausalLM(
        OPTConfig(
            vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, ffn_dim=64, max_position_embeddings=64,
            word_embed_proj_dim=16, do_layer_norm_before=True,
            pad_token_id=27, bos_token_id=27, eos_token_id=27,
        )
    )
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    return str(d)


def test_jax_scorer_opt_projected_dims(tiny_opt_projected):
    from neural_speech_decoder_tpu.decoding.jax_lm import jax_causal_scorer
    from neural_speech_decoder_tpu.decoding.rescore import hf_causal_scorer

    torch_scores = hf_causal_scorer(tiny_opt_projected)(SENTENCES)
    jax_scores = jax_causal_scorer(
        tiny_opt_projected, compute_dtype="float32"
    )(SENTENCES)
    np.testing.assert_allclose(jax_scores, torch_scores, rtol=0, atol=2e-4)


@pytest.mark.parametrize("family", ["gpt2", "opt"])
def test_jax_scorer_matches_torch(family, tiny_gpt2, tiny_opt):
    from neural_speech_decoder_tpu.decoding.jax_lm import jax_causal_scorer
    from neural_speech_decoder_tpu.decoding.rescore import hf_causal_scorer

    path = {"gpt2": tiny_gpt2, "opt": tiny_opt}[family]
    torch_scores = hf_causal_scorer(path)(SENTENCES)
    jax_scores = jax_causal_scorer(path, compute_dtype="float32")(SENTENCES)
    np.testing.assert_allclose(jax_scores, torch_scores, rtol=0, atol=2e-4)
    # single-token sentences have no scored positions -> exactly 0.0
    assert all(s <= 0 for s in jax_scores)


def test_jax_scorer_batching_invariant(tiny_gpt2):
    """Bucketed static-shape batching must not change scores: many sentences
    of different lengths, scored with batch_size 2 vs one call each."""
    from neural_speech_decoder_tpu.decoding.jax_lm import jax_causal_scorer

    sents = ["a b c", "dd", "e f g h i j", "k", "lm no p", "q r"]
    small = jax_causal_scorer(tiny_gpt2, batch_size=2, compute_dtype="float32")
    big = jax_causal_scorer(tiny_gpt2, batch_size=16, compute_dtype="float32")
    np.testing.assert_allclose(small(sents), big(sents), atol=1e-4)


def test_jax_scorer_in_rescore_nbest(tiny_gpt2):
    from neural_speech_decoder_tpu.decoding.beam import Hypothesis
    from neural_speech_decoder_tpu.decoding.jax_lm import jax_causal_scorer
    from neural_speech_decoder_tpu.decoding.rescore import rescore_nbest

    scorer = jax_causal_scorer(tiny_gpt2, compute_dtype="float32")
    nb = [
        [
            Hypothesis([1], ["bat"], 0.0, ac_score=-1.0, lm_score=0.0),
            Hypothesis([2], ["cat"], 0.0, ac_score=-1.2, lm_score=0.0),
        ]
    ]
    out = rescore_nbest(nb, scorer, alpha=0.5)
    assert out[0] in ("bat", "cat")
