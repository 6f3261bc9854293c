"""The bigram-LM-in-OPT construction (decoding/bigram_opt.py): a real
OPT-layout artifact on disk whose engine forward reproduces analytic
bigram log-likelihoods — the no-egress stand-in for a trained rescorer,
validated through the exact production path (writer -> stream_load_hf ->
engine_sentence_logprobs; bf16 and int8)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from neural_speech_decoder_tpu.decoding.bigram_opt import (
    BOS_ID,
    FIRST_WORD_ID,
    BigramOptBuilder,
    build_wordlevel_tokenizer,
)
from neural_speech_decoder_tpu.decoding.llm_engine import (
    engine_sentence_logprobs,
    opt_spec,
    quantize_int8,
    stream_load_hf,
)

K = 16
WORDS = [f"word{i:02d}" for i in range(K)]


@pytest.fixture(scope="module")
def bigram():
    rng = np.random.default_rng(11)
    # sparse-ish random transitions, smoothed, normalized
    p = rng.dirichlet(np.full(K, 0.25), size=K + 1)
    p = 0.98 * p + 0.02 / K
    return np.log(p / p.sum(axis=1, keepdims=True))


@pytest.fixture(scope="module")
def artifact(tmp_path_factory, bigram):
    from make_opt_checkpoint import write_checkpoint

    out = str(tmp_path_factory.mktemp("bigram_opt") / "ckpt")
    token_ids = np.arange(K) + FIRST_WORD_ID
    builder = BigramOptBuilder(opt_spec("125m"), bigram, token_ids)
    write_checkpoint("125m", out, tensor_fn=builder.tensor_fn)
    build_wordlevel_tokenizer(WORDS, out)
    return out, builder


def _true_ll(bigram, word_idx: list[int]) -> float:
    """Analytic bigram log-likelihood with BOS context for the first word."""
    ll = bigram[0, word_idx[0]]
    for a, b in zip(word_idx, word_idx[1:]):
        ll += bigram[1 + a, b]
    return float(ll)


def test_expected_logits_match_centred_rows(bigram):
    builder = BigramOptBuilder(
        opt_spec("125m"), bigram, np.arange(K) + FIRST_WORD_ID
    )
    logits = builder.expected_logits(BOS_ID)
    corpus = logits[FIRST_WORD_ID : FIRST_WORD_ID + K]
    centred = bigram[0] - bigram[0].mean()
    # affine in the centred row (temperature lambda + the eps_id identity
    # term's constant row offset — both softmax-harmless)
    corpus_c = corpus - corpus.mean()
    lam = corpus_c @ centred / (centred @ centred)
    np.testing.assert_allclose(lam, builder.target_lambda, rtol=2e-3)
    np.testing.assert_allclose(corpus_c, lam * centred, atol=1e-5)
    # OOV tokens sit at exactly -oov_penalty for every context
    np.testing.assert_allclose(
        logits[FIRST_WORD_ID + K + 5], -builder.oov_penalty, atol=0.01
    )


@pytest.mark.parametrize("quant", [False, True])
def test_engine_scores_match_true_bigram(artifact, bigram, quant):
    import jax.numpy as jnp

    out, _ = artifact
    params, spec = stream_load_hf(out, "bfloat16")
    if quant:
        params = quantize_int8(params)
    params = {k: v for k, v in params.items()}  # host numpy ok on CPU

    rng = np.random.default_rng(3)
    sents = [rng.integers(0, K, size=int(rng.integers(2, 7))).tolist()
             for _ in range(12)]
    t_max = max(len(s) for s in sents) + 1
    ids = np.full((len(sents), t_max), 0, np.int32)
    mask = np.zeros((len(sents), t_max), np.int32)
    for i, s in enumerate(sents):
        ids[i, 0] = BOS_ID
        ids[i, 1 : 1 + len(s)] = np.asarray(s) + FIRST_WORD_ID
        mask[i, : 1 + len(s)] = 1
    import jax

    jp = jax.tree.map(jnp.asarray, params)
    got = np.asarray(
        engine_sentence_logprobs(jp, spec, jnp.asarray(ids),
                                 jnp.asarray(mask))
    )
    _, builder = artifact
    oracle = builder.oracle_logp()  # [K+1, K] realized log P'(v|u)
    want = np.asarray([_true_ll(oracle, s) for s in sents])
    tol = 1.2 if quant else 0.4  # bf16 / int8 rounding through 12 layers
    np.testing.assert_allclose(got, want, atol=tol)
    # and the realized (sharpened) LM rank-matches the true bigram row-wise
    # on the mass that matters (entries at the smoothing floor are exact
    # ties whose argsort order is arbitrary)
    for r in range(K + 1):
        top_true = np.argsort(bigram[r])[::-1][:6]
        top_oracle = np.argsort(oracle[r])[::-1][:6]
        assert list(top_true) == list(top_oracle), (r, top_true, top_oracle)


def test_tokenizer_roundtrip(artifact):
    from transformers import AutoTokenizer

    out, _ = artifact
    tok = AutoTokenizer.from_pretrained(out)
    enc = tok(["word01 word05", "word00"], padding=True)
    ids = np.asarray(enc["input_ids"])
    assert ids[0, 0] == BOS_ID  # </s> prepended like OPT
    assert ids[0, 1] == FIRST_WORD_ID + 1
    assert ids[1, 2] == tok.pad_token_id


def test_engine_scorer_end_to_end(artifact, bigram):
    """The full production entry point: engine_scorer(model_path) on the
    on-disk artifact scores text sentences rank-consistently with the
    true bigram."""
    from neural_speech_decoder_tpu.decoding.llm_engine import engine_scorer

    out, builder = artifact
    score = engine_scorer(out, batch_size=4)
    rng = np.random.default_rng(5)
    sents_idx = [rng.integers(0, K, size=4).tolist() for _ in range(8)]
    texts = [" ".join(WORDS[i] for i in s) for s in sents_idx]
    got = np.asarray(score(texts))
    want = np.asarray([_true_ll(builder.oracle_logp(), s)
                       for s in sents_idx])
    np.testing.assert_allclose(got, want, atol=0.4)
    assert np.all(np.argsort(got) == np.argsort(want))
