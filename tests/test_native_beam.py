"""Native C++ beam decoder vs the Python oracle."""

import math

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import phone_to_id
from neural_speech_decoder_tpu.decoding.beam import SIL_ID, beam_search
from neural_speech_decoder_tpu.decoding.lexicon import ArpaLM, Lexicon
from neural_speech_decoder_tpu.decoding.lm_decoder import (
    build_lm_decoder,
    lm_decode,
    native_available,
    rearrange_speech_logits,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder not built"
)


LEXICON = """bat B AE T
bad B AE D
cat K AE T
at AE T
two T UW
too T UW
"""

ARPA = """\\data\\
ngram 1=8
ngram 2=3

\\1-grams:
-0.5\t<s>\t-0.3
-0.9\t</s>
-0.7\tbat\t-0.2
-1.5\tbad\t-0.2
-0.8\tcat\t-0.2
-1.0\tat\t-0.2
-1.2\ttwo\t-0.2
-1.4\ttoo\t-0.2

\\2-grams:
-0.1\t<s> cat
-0.2\tcat bat
-0.3\tbat </s>

\\end\\
"""


@pytest.fixture
def paths(tmp_path):
    lex = tmp_path / "lexicon.txt"
    lex.write_text(LEXICON)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    return str(lex), str(arpa)


def random_logprobs(rng, t=25, k=41, bias_ids=None, bias=2.0):
    x = rng.standard_normal((t, k)).astype(np.float32)
    if bias_ids is not None:
        for j, c in enumerate(bias_ids):
            lo = j * t // len(bias_ids)
            hi = (j + 1) * t // len(bias_ids)
            x[lo:hi, c] += bias
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_python_oracle(paths, seed):
    lex_path, arpa_path = paths
    rng = np.random.default_rng(seed)
    ids = [phone_to_id(p) + 1 for p in ["K", "AE", "T"]] + [SIL_ID] + [
        phone_to_id(p) + 1 for p in ["B", "AE", "T"]
    ] + [SIL_ID]
    lp = random_logprobs(rng, t=32, bias_ids=ids, bias=3.0)

    kwargs = dict(acoustic_scale=0.5, nbest=8, beam=30.0, lm_weight=1.5)
    native = build_lm_decoder(lex_path, arpa_path, **kwargs)
    python = build_lm_decoder(lex_path, arpa_path, force_python=True, **kwargs)
    assert native.handle is not None and python.handle is None

    bp = math.log(7)
    h_nat = lm_decode(native, lp, blank_penalty=bp)
    h_py = lm_decode(python, lp, blank_penalty=bp)
    assert len(h_nat) == len(h_py)
    for a, b in zip(h_nat, h_py):
        assert a.phones == b.phones
        assert a.words == b.words
        assert abs(a.score - b.score) < 1e-3
        assert abs(a.lm_score - b.lm_score) < 1e-3


def test_native_unconstrained_mode(paths):
    rng = np.random.default_rng(5)
    lp = random_logprobs(rng, t=15)
    native = build_lm_decoder(None, None, nbest=5, beam=20.0)
    python = build_lm_decoder(None, None, nbest=5, beam=20.0,
                              force_python=True)
    h_nat = lm_decode(native, lp)
    h_py = lm_decode(python, lp)
    assert [h.phones for h in h_nat] == [h.phones for h in h_py]


def test_rearrange_speech_logits_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 41)).astype(np.float32)
    y = rearrange_speech_logits(x, blank_last=True)
    np.testing.assert_array_equal(y[..., -1], x[..., 0])
    z = rearrange_speech_logits(y, blank_last=False)
    np.testing.assert_array_equal(z, x)
