"""Differential fuzzing: native C++ decoder vs the Python oracle across
randomized lexicons, LMs, logits, and knob combinations.

The targeted parity tests pin specific behaviors; this sweep hunts for
edge-case divergence between ``csrc/ctc_beam.cpp`` and
``decoding/beam.py`` over the whole knob surface (LM on/off, OOV track,
boundary-free commits, blank penalty, n-best width) on unstructured
random inputs, where tie-breaking and pruning corners actually trigger.
"""

import math

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import PHONE_DEF_SIL, phone_to_id
from neural_speech_decoder_tpu.decoding.lm_decoder import (
    build_lm_decoder,
    lm_decode,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder not built"
)

PHONES = [p for p in PHONE_DEF_SIL if p != "SIL"]


def random_lexicon(rng, n_words):
    """Random pronunciations (1-4 phones), occasional homophones."""
    lines = []
    prons = []
    for i in range(n_words):
        if prons and rng.random() < 0.2:
            pron = prons[rng.integers(len(prons))]  # homophone
        else:
            pron = [
                PHONES[rng.integers(len(PHONES))]
                for _ in range(rng.integers(1, 5))
            ]
        prons.append(pron)
        lines.append(f"w{i} {' '.join(pron)}")
    words = [f"w{i}" for i in range(n_words)]
    return "\n".join(lines) + "\n", words


def random_arpa(rng, words):
    """Unigram ARPA over the lexicon words (+ <unk> for the OOV track)."""
    vocab = ["<s>", "</s>", "<unk>"] + list(words)
    lines = ["\\data\\", f"ngram 1={len(vocab)}", "", "\\1-grams:"]
    for w in vocab:
        lines.append(f"-{rng.uniform(0.3, 2.5):.3f}\t{w}")
    lines += ["", "\\end\\", ""]
    return "\n".join(lines)


@pytest.mark.parametrize("seed", range(16))
def test_native_matches_oracle_fuzz(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    n_words = int(rng.integers(3, 12))
    lex_text, words = random_lexicon(rng, n_words)
    lex_path = tmp_path / "lex.txt"
    lex_path.write_text(lex_text)

    use_lm = bool(rng.random() < 0.7)
    arpa_path = None
    if use_lm:
        arpa_path = tmp_path / "lm.arpa"
        arpa_path.write_text(random_arpa(rng, words))

    kwargs = dict(
        acoustic_scale=float(rng.uniform(0.3, 1.0)),
        nbest=int(rng.integers(3, 12)),
        beam=float(rng.uniform(12.0, 30.0)),
        max_active=int(rng.integers(40, 200)),
        lm_weight=float(rng.uniform(0.5, 1.5)) if use_lm else 1.0,
        word_ins_penalty=float(rng.uniform(-0.5, 0.5)),
        top_k_tokens=int(rng.integers(6, 14)),
        oov_cost=float(-rng.uniform(2.0, 6.0)) if rng.random() < 0.5 else None,
        boundary_free=bool(rng.random() < 0.5),
    )

    # unstructured random logits with a mild bias toward lexicon phones
    t = int(rng.integers(10, 40))
    lp = rng.standard_normal((t, 41)).astype(np.float32)
    for line in lex_text.splitlines():
        for p in line.split()[1:]:
            lp[:, phone_to_id(p) + 1] += 0.35
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
    blank_penalty = float(rng.uniform(0.0, math.log(7)))

    native = build_lm_decoder(str(lex_path),
                              str(arpa_path) if use_lm else None, **kwargs)
    oracle = build_lm_decoder(str(lex_path),
                              str(arpa_path) if use_lm else None,
                              force_python=True, **kwargs)
    h_nat = lm_decode(native, lp, blank_penalty=blank_penalty)
    h_py = lm_decode(oracle, lp, blank_penalty=blank_penalty)

    assert len(h_nat) == len(h_py), (len(h_nat), len(h_py))
    for a, b in zip(h_nat, h_py):
        assert abs(a.score - b.score) < 5e-3, (kwargs, a.score, b.score)
    # content comparison is tie-aware: both engines tie-break
    # deterministically on exact doubles, but cross-engine last-ulp score
    # drift can still permute hypotheses within a tied group — match
    # bijectively under the score tolerance instead of positionally
    remaining = list(h_py)
    for a in h_nat:
        for i, b in enumerate(remaining):
            if (a.phones == b.phones and a.words == b.words
                    and abs(a.score - b.score) < 5e-3):
                remaining.pop(i)
                break
        else:
            raise AssertionError(
                f"native hyp unmatched in oracle n-best: {kwargs} "
                f"{a.words} {a.phones} {a.score}\n"
                f"oracle: {[(h.words, h.score) for h in h_py]}"
            )
