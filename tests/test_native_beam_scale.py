"""Native decoder vs oracle at larger scale (bigger lexicon, longer T)."""

import math
import os

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import PHONE_DEF
from neural_speech_decoder_tpu.decoding.lm_decoder import (
    build_lm_decoder,
    lm_decode,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder not built"
)


def build_random_lexicon(rng, n_words=24):
    words = []
    lines = []
    for i in range(n_words):
        w = "w" + "".join(rng.choice(list("abcdefgh"), 3))
        if w in words:
            continue
        words.append(w)
        phones = rng.choice(PHONE_DEF, size=rng.integers(2, 5), replace=True)
        lines.append(f"{w} {' '.join(phones)}")
    return words, "\n".join(lines)


def test_large_random_case_matches_oracle(tmp_path):
    rng = np.random.default_rng(42)
    words, lex_text = build_random_lexicon(rng)
    lex_path = tmp_path / "lex.txt"
    lex_path.write_text(lex_text)
    arpa = ["\\data\\", f"ngram 1={len(words) + 2}", "", "\\1-grams:",
            "-0.5\t<s>", "-0.9\t</s>"]
    for w in words:
        arpa.append(f"{-float(rng.uniform(0.5, 2.0)):.3f}\t{w}")
    arpa += ["", "\\end\\"]
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text("\n".join(arpa))

    t, k = 80, 41
    x = rng.standard_normal((t, k)).astype(np.float32) * 1.5
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))

    kwargs = dict(acoustic_scale=0.5, nbest=20, beam=25.0, lm_weight=1.2,
                  max_active=300)
    native = build_lm_decoder(str(lex_path), str(arpa_path), **kwargs)
    python = build_lm_decoder(str(lex_path), str(arpa_path),
                              force_python=True, **kwargs)
    h_nat = lm_decode(native, lp, blank_penalty=math.log(7))
    h_py = lm_decode(python, lp, blank_penalty=math.log(7))
    assert len(h_nat) == len(h_py) > 0
    for a, b in zip(h_nat, h_py):
        assert a.phones == b.phones and a.words == b.words
        assert abs(a.score - b.score) < 2e-3


def test_big_lexicon_reference_operating_point(tmp_path):
    """Native decode at the reference hyperparameters (nbest=100, beam=18,
    blank penalty ln 7 — reference eval_competition.py:89-116) on a
    generated large lexicon + trigram ARPA (scripts/gen_decode_artifacts.py
    at full scale; scaled to 8k words here to keep the test fast)."""
    import subprocess
    import sys
    import time

    root = os.path.join(os.path.dirname(__file__), "..")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts/gen_decode_artifacts.py"),
         "--out", str(tmp_path), "--n-words", "8000", "--order", "3",
         "--n-bigrams", "40000", "--n-trigrams", "80000"],
        check=True, capture_output=True,
    )
    dec = build_lm_decoder(
        str(tmp_path / "lexicon.txt"), str(tmp_path / "lm_3gram.arpa"),
        acoustic_scale=0.5, nbest=100, beam=18.0, max_active=200,
        oov_cost=-4.0,
    )
    rng = np.random.default_rng(0)
    t, k = 313, 41
    x = rng.standard_normal((t, k)).astype(np.float32) * 2.0
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    start = time.perf_counter()
    hyps = lm_decode(dec, lp, blank_penalty=math.log(7))
    elapsed = time.perf_counter() - start
    assert len(hyps) > 0
    assert all(h.phones for h in hyps)
    # scores strictly ranked, finite
    scores = [h.score for h in hyps]
    assert scores == sorted(scores, reverse=True)
    assert np.isfinite(scores).all()
    assert elapsed < 10.0, f"decode too slow: {elapsed:.1f}s"


def test_native_is_faster_than_python_oracle(tmp_path):
    import time

    rng = np.random.default_rng(1)
    words, lex_text = build_random_lexicon(rng)
    lex_path = tmp_path / "lex.txt"
    lex_path.write_text(lex_text)
    t = 120
    x = rng.standard_normal((t, 41)).astype(np.float32) * 1.5
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    kwargs = dict(acoustic_scale=0.5, nbest=10, beam=20.0, max_active=200)
    native = build_lm_decoder(str(lex_path), None, **kwargs)
    python = build_lm_decoder(str(lex_path), None, force_python=True, **kwargs)

    t0 = time.perf_counter()
    lm_decode(native, lp)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    lm_decode(python, lp)
    t_py = time.perf_counter() - t0
    # the point of the native engine: at least 5x the Python oracle
    assert t_nat * 5 < t_py, (t_nat, t_py)
