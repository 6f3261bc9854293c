"""Native decoder benchmark at the reference operating point.

Reference hyperparameters (``scripts/eval_competition.py:89-116``):
acoustic_scale=0.5, nbest=100, beam=18, blank_penalty=ln(7), 5-gram LM over
a real vocabulary. This benchmark measures the in-repo native engine
(csrc/ctc_beam.cpp) on reference-scale synthetic artifacts
(scripts/gen_decode_artifacts.py): build/load time, resident memory,
single-thread s/sample, and OpenMP batch throughput.

Synthetic utterances are shaped like real model output: T'=313 frames
(T=1280 envelope / stride 4), K=41, phone sequences drawn from lexicon
words with SIL boundaries and CTC-style blank/repeat structure plus noise.

Usage:
  python scripts/gen_decode_artifacts.py --out /tmp/decode_artifacts
  python scripts/bench_decode.py --artifacts /tmp/decode_artifacts
"""

import argparse
import json
import math
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from neural_speech_decoder_tpu.data.phonemes import phone_to_id  # noqa: E402
from neural_speech_decoder_tpu.decoding.lexicon import Lexicon  # noqa: E402
from neural_speech_decoder_tpu.decoding.lm_decoder import (  # noqa: E402
    build_lm_decoder,
    lm_decode,
    lm_decode_batch,
    native_available,
)

SIL = 40


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def synth_utterances(rng, lexicon: Lexicon, n: int, t: int = 313, k: int = 41,
                     strength: float = 5.0):
    """CTC-like log-probs for sentences of real lexicon words."""
    # Re-derive phone sequences per word from the trie is awkward; sample
    # from the raw file lines instead (caller passes parsed (word, phones)).
    out = np.empty((n, t, k), np.float32)
    for i in range(n):
        frames = []
        while len(frames) < t:
            wid = rng.integers(0, len(lexicon.words))
            phones = _pron_of(lexicon, wid, rng)
            for p in phones:
                frames.extend([p] * int(rng.integers(2, 5)))
                if rng.random() < 0.5:
                    frames.append(0)
            frames.extend([SIL] * int(rng.integers(2, 4)))
        frames = frames[:t]
        x = rng.standard_normal((t, k)).astype(np.float32)
        x[np.arange(t), frames] += strength
        out[i] = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return out


def _pron_of(lexicon: Lexicon, wid: int, rng, max_len: int = 16):
    """Random walk to a node containing wid is expensive; instead cache a
    word->pronunciation map on first use."""
    if not hasattr(lexicon, "_pron_cache"):
        cache = {}

        def walk(node, path):
            for w in node.words:
                cache.setdefault(w, path)
            for pid, child in node.children.items():
                walk(child, path + [pid])

        sys.setrecursionlimit(100000)
        walk(lexicon.root, [])
        lexicon._pron_cache = cache
    return lexicon._pron_cache.get(wid, [SIL])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", required=True)
    ap.add_argument("--arpa", default=None,
                    help="ARPA filename inside --artifacts (default: "
                         "largest lm_*.arpa)")
    ap.add_argument("--n-utts", type=int, default=32)
    ap.add_argument("--nbest", type=int, default=100)
    ap.add_argument("--beam", type=float, default=18.0)
    ap.add_argument("--max-active", type=int, default=200)
    ap.add_argument("--oov-cost", type=float, default=None)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    assert native_available(), "native decoder library not built"
    lex_path = os.path.join(args.artifacts, "lexicon.txt")
    if args.arpa:
        arpa_path = os.path.join(args.artifacts, args.arpa)
    else:
        cands = [f for f in os.listdir(args.artifacts)
                 if f.startswith("lm_") and f.endswith(".arpa")]
        arpa_path = os.path.join(
            args.artifacts,
            max(cands, key=lambda f: os.path.getsize(
                os.path.join(args.artifacts, f))),
        )

    results = {}
    m0 = rss_mb()
    t0 = time.perf_counter()
    dec = build_lm_decoder(
        lex_path, arpa_path, acoustic_scale=0.5, nbest=args.nbest,
        beam=args.beam, max_active=args.max_active, lm_weight=1.0,
        oov_cost=args.oov_cost,
    )
    results["build_s"] = round(time.perf_counter() - t0, 2)
    results["build_rss_mb"] = round(rss_mb() - m0, 1)
    results["arpa_mb"] = round(os.path.getsize(arpa_path) / 1e6, 1)

    print("loading lexicon for utterance synthesis...", file=sys.stderr)
    py_lex = Lexicon.from_file(lex_path)
    rng = np.random.default_rng(0)
    lp = synth_utterances(rng, py_lex, args.n_utts)
    lens = np.full((args.n_utts,), lp.shape[1], np.int32)
    bp = math.log(7)

    # warm + single-thread latency
    lm_decode(dec, lp[0], blank_penalty=bp)
    t0 = time.perf_counter()
    n_serial = min(8, args.n_utts)
    hyp_counts = []
    for i in range(n_serial):
        hyps = lm_decode(dec, lp[i], blank_penalty=bp)
        hyp_counts.append(len(hyps))
    dt = (time.perf_counter() - t0) / n_serial
    results["serial_s_per_sample"] = round(dt, 4)
    results["mean_nbest_returned"] = float(np.mean(hyp_counts))

    t0 = time.perf_counter()
    batched = lm_decode_batch(dec, lp, lens, blank_penalty=bp,
                              n_threads=args.threads)
    bt = time.perf_counter() - t0
    results["batch_s_per_sample"] = round(bt / args.n_utts, 4)
    results["batch_speedup"] = round(dt * args.n_utts / bt, 2)
    results["peak_rss_mb"] = round(rss_mb(), 1)

    # sanity: batch output consistent with serial for the first utterance
    # (an empty n-best — every beam state at an incomplete trie node at
    # truncation — is possible for synthetic data; don't crash post-timing)
    h0 = lm_decode(dec, lp[0], blank_penalty=bp)
    assert bool(batched[0]) == bool(h0)
    if batched[0]:
        assert batched[0][0].words == h0[0].words

    print(json.dumps(results))


if __name__ == "__main__":
    main()
