"""OOV fallback track + batched decode: native engine vs Python oracle.

The upstream WFST decoder degrades gracefully on out-of-lexicon words via
its grammar (reference ``scripts/eval_competition.py:88-116`` operating
point); this framework's equivalent is the free-phone OOV track
(``oov_cost``) committing ``<unk>``.
"""

import math

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import PHONE_DEF, phone_to_id
from neural_speech_decoder_tpu.decoding.lm_decoder import (
    build_lm_decoder,
    lm_decode,
    lm_decode_batch,
    native_available,
)

SIL = 40


def pid(p):
    return phone_to_id(p) + 1


def logits_for(phone_ids, t_per=3, k=41, seed=0, strength=6.0):
    """Synthetic frame log-probs strongly favoring a phone sequence."""
    rng = np.random.default_rng(seed)
    frames = []
    for p in phone_ids:
        for _ in range(t_per):
            frames.append(p)
        frames.append(0)  # blank separator (allows repeats)
    x = rng.standard_normal((len(frames), k)).astype(np.float32)
    for t, p in enumerate(frames):
        x[t, p] += strength
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.fixture
def small_lexicon(tmp_path):
    lex = tmp_path / "lex.txt"
    lex.write_text("cat K AE T\ndog D AO G\n")
    return str(lex)


@pytest.mark.skipif(not native_available(), reason="native decoder not built")
def test_oov_decodes_unk_and_matches_oracle(small_lexicon):
    # "cat <SIL> B IY K <SIL> dog" — "B IY K" is not in the lexicon.
    seq = [pid(p) for p in ["K", "AE", "T"]] + [SIL]
    seq += [pid(p) for p in ["B", "IY", "K"]] + [SIL]
    seq += [pid(p) for p in ["D", "AO", "G"]] + [SIL]
    lp = logits_for(seq)

    kwargs = dict(acoustic_scale=0.5, nbest=10, beam=25.0, max_active=200,
                  oov_cost=-2.0)
    native = build_lm_decoder(small_lexicon, None, **kwargs)
    python = build_lm_decoder(small_lexicon, None, force_python=True, **kwargs)
    h_nat = lm_decode(native, lp, blank_penalty=math.log(2))
    h_py = lm_decode(python, lp, blank_penalty=math.log(2))
    assert h_nat[0].words == ["cat", "<unk>", "dog"]
    assert len(h_nat) == len(h_py)
    for a, b in zip(h_nat, h_py):
        assert a.phones == b.phones and a.words == b.words
        assert abs(a.score - b.score) < 2e-3

    # with OOV disabled the middle segment cannot form a word
    strict = build_lm_decoder(small_lexicon, None, acoustic_scale=0.5,
                              nbest=10, beam=25.0, max_active=200)
    h_strict = lm_decode(strict, lp, blank_penalty=math.log(2))
    assert all("<unk>" not in h.words for h in h_strict)
    assert all(h.words != ["cat", "<unk>", "dog"] for h in h_strict)


def test_oov_oracle_prefers_lexicon_when_in_vocab(small_lexicon):
    # In-lexicon audio should still decode to the word, not <unk>: the
    # per-phone oov_cost strictly dominates.
    seq = [pid(p) for p in ["D", "AO", "G"]] + [SIL]
    lp = logits_for(seq, seed=3)
    dec = build_lm_decoder(small_lexicon, None, force_python=True,
                           acoustic_scale=0.5, nbest=5, beam=20.0,
                           max_active=100, oov_cost=-2.0)
    hyps = lm_decode(dec, lp)
    assert hyps[0].words == ["dog"]


@pytest.mark.skipif(not native_available(), reason="native decoder not built")
def test_boundary_free_decodes_without_sil(small_lexicon):
    """SIL-free decoding: words commit eagerly at word-end trie nodes (the
    upstream WFST handles SIL-less lexicons via epsilon word arcs)."""
    # "K AE T D AO G" with no SIL anywhere
    seq = [pid(p) for p in ["K", "AE", "T", "D", "AO", "G"]]
    lp = logits_for(seq)

    kwargs = dict(acoustic_scale=0.5, nbest=10, beam=25.0, max_active=200,
                  boundary_free=True)
    native = build_lm_decoder(small_lexicon, None, **kwargs)
    python = build_lm_decoder(small_lexicon, None, force_python=True, **kwargs)
    h_nat = lm_decode(native, lp, blank_penalty=math.log(2))
    h_py = lm_decode(python, lp, blank_penalty=math.log(2))
    assert h_nat[0].words == ["cat", "dog"]
    assert len(h_nat) == len(h_py)
    for a, b in zip(h_nat, h_py):
        assert a.phones == b.phones and a.words == b.words
        assert abs(a.score - b.score) < 2e-3

    # default (SIL-delimited) mode cannot commit both words back to back
    strict = build_lm_decoder(small_lexicon, None, acoustic_scale=0.5,
                              nbest=10, beam=25.0, max_active=200)
    h_strict = lm_decode(strict, lp, blank_penalty=math.log(2))
    assert all(h.words != ["cat", "dog"] for h in h_strict)


@pytest.mark.skipif(not native_available(), reason="native decoder not built")
def test_batch_decode_matches_serial(tmp_path):
    rng = np.random.default_rng(7)
    words = ["cat", "dog", "sun", "moon"]
    prons = ["K AE T", "D AO G", "S AH N", "M UW N"]
    lex = tmp_path / "lex.txt"
    lex.write_text("\n".join(f"{w} {p}" for w, p in zip(words, prons)))
    arpa = ["\\data\\", "ngram 1=7", "", "\\1-grams:", "-0.5\t<s>",
            "-0.9\t</s>", "-1.2\t<unk>"]
    for w in words:
        arpa.append(f"-{rng.uniform(0.5, 2.0):.3f}\t{w}")
    arpa += ["", "\\end\\"]
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text("\n".join(arpa))

    dec = build_lm_decoder(str(lex), str(arpa_path), acoustic_scale=0.5,
                           nbest=8, beam=22.0, max_active=150, lm_weight=1.1,
                           oov_cost=-3.0)
    n, t_max, k = 6, 90, 41
    lens = rng.integers(40, t_max + 1, size=(n,)).astype(np.int32)
    x = rng.standard_normal((n, t_max, k)).astype(np.float32) * 1.5
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))

    batched = lm_decode_batch(dec, lp, lens, blank_penalty=math.log(7),
                              n_threads=3)
    assert len(batched) == n
    for i in range(n):
        serial = lm_decode(dec, lp[i, : lens[i]], blank_penalty=math.log(7))
        assert len(batched[i]) == len(serial) > 0
        for a, b in zip(batched[i], serial):
            assert a.phones == b.phones and a.words == b.words
            assert abs(a.score - b.score) < 1e-5
