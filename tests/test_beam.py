"""Lexicon/LM-constrained CTC prefix beam search (Python oracle)."""

import math

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import phone_to_id
from neural_speech_decoder_tpu.decoding.beam import SIL_ID, beam_search
from neural_speech_decoder_tpu.decoding.lexicon import (
    ArpaLM,
    Lexicon,
    sentence_logprob,
)


def pid(p):
    return phone_to_id(p) + 1


def frames_for(ids, k=41, peak=6.0):
    """Peaked log-prob frames for a phone-id sequence (blank between)."""
    seq = []
    for i in ids:
        seq += [i, 0]
    t = len(seq)
    x = np.full((t, k), -peak, np.float32)
    for j, c in enumerate(seq):
        x[j, c] = peak
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def small_lexicon():
    lex = Lexicon()
    lex.add("bat", ["B", "AE", "T"])
    lex.add("bad", ["B", "AE", "D"])
    lex.add("cat", ["K", "AE", "T"])
    lex.add("at", ["AE", "T"])
    return lex


def write_arpa(tmp_path, lines):
    p = tmp_path / "lm.arpa"
    p.write_text("\n".join(lines))
    return str(p)


ARPA = [
    "\\data\\",
    "ngram 1=6",
    "ngram 2=3",
    "",
    "\\1-grams:",
    "-0.5\t<s>\t-0.3",
    "-0.9\t</s>",
    "-0.7\tbat\t-0.2",
    "-1.5\tbad\t-0.2",
    "-0.8\tcat\t-0.2",
    "-1.0\tat\t-0.2",
    "",
    "\\2-grams:",
    "-0.1\t<s> cat",
    "-0.2\tcat bat",
    "-0.3\tbat </s>",
    "",
    "\\end\\",
]


def test_arpa_parse_and_backoff(tmp_path):
    lm = ArpaLM.from_file(write_arpa(tmp_path, ARPA))
    assert lm.order == 2
    ln10 = math.log(10)
    # direct bigram
    s = lm.score((lm.vocab["<s>"],), lm.vocab["cat"])
    assert abs(s - (-0.1) * ln10) < 1e-6
    # backoff: P(bad | <s>) = bo(<s>) + P(bad)
    s = lm.score((lm.vocab["<s>"],), lm.vocab["bad"])
    assert abs(s - ((-0.3) + (-1.5)) * ln10) < 1e-6
    # sentence scoring helper
    total = sentence_logprob(lm, ["cat", "bat"])
    expect = ((-0.1) + (-0.2) + (-0.3)) * ln10
    assert abs(total - expect) < 1e-6


def test_unconstrained_beam_matches_greedy_on_peaked_input():
    ids = [pid("B"), pid("AE"), pid("T"), SIL_ID]
    lp = frames_for(ids)
    hyps = beam_search(lp, acoustic_scale=1.0, nbest=3, beam=50.0)
    assert hyps[0].phones == ids


def test_lexicon_constrains_to_valid_words():
    lex = small_lexicon()
    # acoustics say "B AE Z" (Z invalid mid-word) - decoder must pick a word
    ids = [pid("B"), pid("AE"), pid("Z"), SIL_ID]
    lp = frames_for(ids)
    hyps = beam_search(lp, lexicon=lex, acoustic_scale=1.0, nbest=5, beam=50.0)
    assert hyps, "no hypotheses survived"
    for h in hyps:
        assert all(w in ("bat", "bad", "cat", "at") for w in h.words)
    assert hyps[0].words in (["bat"], ["bad"])


def test_lm_rescoring_changes_ranking(tmp_path):
    lex = small_lexicon()
    lm = ArpaLM.from_file(write_arpa(tmp_path, ARPA))
    # Ambiguous T/D final phone: acoustics slightly favor "bad"
    ids = [pid("B"), pid("AE"), pid("D"), SIL_ID]
    lp = frames_for(ids, peak=1.2)
    t_row = np.where(lp[4] > -10)[0]
    no_lm = beam_search(lp, lexicon=lex, acoustic_scale=1.0, nbest=5,
                        beam=50.0)
    with_lm = beam_search(lp, lexicon=lex, lm=lm, acoustic_scale=1.0,
                          lm_weight=3.0, nbest=5, beam=50.0)
    assert no_lm[0].words == ["bad"]
    # LM strongly prefers "bat" (-0.7) over "bad" (-1.5)
    assert with_lm[0].words == ["bat"]


def test_homophone_branching():
    lex = Lexicon()
    lex.add("two", ["T", "UW"])
    lex.add("too", ["T", "UW"])
    ids = [pid("T"), pid("UW"), SIL_ID]
    lp = frames_for(ids)
    hyps = beam_search(lp, lexicon=lex, acoustic_scale=1.0, nbest=5, beam=50.0)
    words = {tuple(h.words) for h in hyps}
    assert ("two",) in words and ("too",) in words


def test_multi_word_with_trailing_commit():
    lex = small_lexicon()
    # "cat bat" with no trailing SIL: final word must still commit
    ids = [pid("K"), pid("AE"), pid("T"), SIL_ID, pid("B"), pid("AE"), pid("T")]
    lp = frames_for(ids)
    hyps = beam_search(lp, lexicon=lex, acoustic_scale=1.0, nbest=5, beam=50.0)
    assert hyps[0].words == ["cat", "bat"]


def test_nbest_scores_sorted():
    lex = small_lexicon()
    ids = [pid("B"), pid("AE"), pid("T"), SIL_ID]
    lp = frames_for(ids, peak=1.0)
    hyps = beam_search(lp, lexicon=lex, acoustic_scale=0.5,
                       blank_penalty=math.log(7), nbest=10, beam=50.0)
    scores = [h.score for h in hyps]
    assert scores == sorted(scores, reverse=True)
    assert len(hyps) > 1
