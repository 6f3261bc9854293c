"""Incremental native LM decode (LMStream) vs the offline engine.

The session API and ``lm_decode`` share one C++ code path (offline decode
is start + one feed + nbest), so chunked feeding must reproduce the
offline n-best bit-for-bit regardless of chunk boundaries.
"""

import math

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.phonemes import phone_to_id
from neural_speech_decoder_tpu.decoding.lm_decoder import (
    build_lm_decoder,
    lm_decode,
    native_available,
    open_stream,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder not built"
)

LEXICON = """bat B AE T
cat K AE T
two T UW
"""

ARPA = """\\data\\
ngram 1=5

\\1-grams:
-0.5\t<s>
-0.9\t</s>
-0.6\tbat
-0.6\tcat
-0.7\ttwo
\\end\\
"""


@pytest.fixture
def decoder(tmp_path):
    lex = tmp_path / "lexicon.txt"
    lex.write_text(LEXICON)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    return build_lm_decoder(
        str(lex), str(arpa), acoustic_scale=0.5, nbest=8, beam=25.0,
        max_active=200,
    )


def _logits(rng, ids, t_per=4):
    t = len(ids) * t_per
    lp = rng.standard_normal((t, 41)).astype(np.float32)
    for j, c in enumerate(ids):
        lp[j * t_per : (j + 1) * t_per, c] += 3.0
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


@pytest.mark.parametrize("chunk", [1, 3, 7, 100])
def test_chunked_feed_matches_offline(decoder, chunk):
    rng = np.random.default_rng(0)
    sil = phone_to_id("SIL") + 1
    ids = [phone_to_id(p) + 1 for p in ["K", "AE", "T"]] + [sil] + [
        phone_to_id(p) + 1 for p in ["T", "UW"]
    ] + [sil]
    lp = _logits(rng, ids)
    bp = math.log(2)

    offline = lm_decode(decoder, lp, blank_penalty=bp, return_nbest=True)

    with open_stream(decoder) as stream:
        for start in range(0, lp.shape[0], chunk):
            stream.feed(lp[start : start + chunk], blank_penalty=bp)
        streamed = stream.nbest()

    assert [h.words for h in streamed] == [h.words for h in offline]
    assert [h.phones for h in streamed] == [h.phones for h in offline]
    np.testing.assert_allclose(
        [h.score for h in streamed], [h.score for h in offline], atol=1e-6
    )


def test_partial_results_progress(decoder):
    """Mid-stream nbest shows the words decoded so far and does not
    disturb the beam (final result unchanged by peeking)."""
    rng = np.random.default_rng(1)
    sil = phone_to_id("SIL") + 1
    first = [phone_to_id(p) + 1 for p in ["B", "AE", "T"]] + [sil]
    second = [phone_to_id(p) + 1 for p in ["T", "UW"]] + [sil]
    lp1 = _logits(rng, first)
    lp2 = _logits(rng, second)
    bp = math.log(2)

    with open_stream(decoder) as stream:
        stream.feed(lp1, blank_penalty=bp)
        partial = stream.nbest()
        assert partial[0].words == ["bat"]
        stream.feed(lp2, blank_penalty=bp)
        final = stream.nbest()
        assert final[0].words == ["bat", "two"]

    offline = lm_decode(
        decoder, np.concatenate([lp1, lp2]), blank_penalty=bp,
        return_nbest=True,
    )
    assert final[0].words == offline[0].words
    np.testing.assert_allclose(final[0].score, offline[0].score, atol=1e-6)


def test_stream_requires_native(decoder, tmp_path):
    lex = tmp_path / "l2.txt"
    lex.write_text(LEXICON)
    py = build_lm_decoder(str(lex), None, force_python=True)
    with pytest.raises(RuntimeError, match="native"):
        open_stream(py)


def test_partial_nbest_mid_word_speculates(decoder):
    """A peek taken mid-word surfaces the beam's speculative completions
    (only word-boundary/completable states finalize — the dominant
    in-word state itself is not directly reportable), and the stream then
    converges to the completed word."""
    rng = np.random.default_rng(2)
    kae = [phone_to_id(p) + 1 for p in ["K", "AE"]]
    lp_mid = _logits(rng, kae, t_per=8)  # 16 confident in-word frames
    with open_stream(decoder) as stream:
        stream.feed(lp_mid, blank_penalty=math.log(2))
        partial = stream.nbest()
        # the only lexicon continuation of "K AE" is "cat" — the top
        # speculation commits it (deep in the n-best, noise paths like
        # "bat" survive the beam too)
        assert partial and partial[0].words == ["cat"]
        rest = [phone_to_id("T") + 1, phone_to_id("SIL") + 1]
        stream.feed(_logits(rng, rest, t_per=4), blank_penalty=math.log(2))
        final = stream.nbest()
        assert final and final[0].words == ["cat"]
