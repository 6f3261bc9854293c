"""Generate reference-scale decode artifacts: a CMUdict-style lexicon and an
ARPA backoff n-gram LM.

The reference's decode stack consumes a real CMUdict lexicon (~134k words)
and a 5-gram ARPA over a large vocabulary (upstream ``lang_test`` directory,
reference ``scripts/eval_competition.py:88-91``). Real artifacts cannot
enter this environment (no egress), so this script synthesizes artifacts at
the same scale for stress/latency/memory validation of the native decoder:

  * lexicon: N pseudo-English words, pronunciation lengths drawn to match
    CMUdict statistics (mean ~6.3 phones, 2-15), homophones included;
  * ARPA: order-K (default 3) with unigrams over the full vocabulary and
    sampled higher-order n-grams with plausible log-prob/backoff ranges.

Usage:
  python scripts/gen_decode_artifacts.py --out /tmp/decode_artifacts \
      --n-words 60000 --order 3 --n-bigrams 600000 --n-trigrams 1200000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from neural_speech_decoder_tpu.data.phonemes import PHONE_DEF  # noqa: E402

CONSONANT_CLUSTERS = [
    "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "r", "s",
    "t", "v", "w", "z", "st", "tr", "ch", "sh", "th", "br", "cl", "gr",
]
VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ou", "io"]


def make_word(rng) -> str:
    n_syl = 1 + rng.geometric(0.45)
    out = []
    for _ in range(min(n_syl, 5)):
        out.append(CONSONANT_CLUSTERS[rng.integers(len(CONSONANT_CLUSTERS))])
        out.append(VOWELS[rng.integers(len(VOWELS))])
    if rng.random() < 0.5:
        out.append(CONSONANT_CLUSTERS[rng.integers(len(CONSONANT_CLUSTERS))])
    return "".join(out)


def gen_lexicon(rng, n_words: int) -> tuple[list[str], list[str]]:
    words: list[str] = []
    seen = set()
    lines = []
    # CMUdict pronunciation length: roughly normal around 6.3, clipped 2-15
    while len(words) < n_words:
        w = make_word(rng)
        if w in seen:
            continue
        seen.add(w)
        words.append(w)
        n_ph = int(np.clip(rng.normal(6.3, 2.0), 2, 15))
        phones = rng.choice(PHONE_DEF, size=n_ph, replace=True)
        lines.append(f"{w}  {' '.join(phones)}")
        # ~2% of words get an alternate pronunciation (CMUdict "(2)" style)
        if rng.random() < 0.02:
            n_ph = int(np.clip(rng.normal(6.3, 2.0), 2, 15))
            phones = rng.choice(PHONE_DEF, size=n_ph, replace=True)
            lines.append(f"{w}(2)  {' '.join(phones)}")
    return words, lines


def gen_arpa(rng, words: list[str], order: int, counts: list[int]) -> list[str]:
    """counts[k] = number of (k+2)-grams to sample (len = order-1)."""
    vocab = ["<s>", "</s>", "<unk>"] + words
    lines = ["\\data\\", f"ngram 1={len(vocab)}"]
    for k, c in enumerate(counts):
        lines.append(f"ngram {k + 2}={c}")
    lines.append("")
    lines.append("\\1-grams:")
    # unigram probs ~ Zipf over the vocab, with backoff weights
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    rng.shuffle(probs)
    for w, p in zip(vocab, probs):
        bo = rng.uniform(-1.2, -0.1)
        lines.append(f"{np.log10(p):.4f}\t{w}\t{bo:.4f}")
    lines.append("")
    for k, c in enumerate(counts):
        n = k + 2
        lines.append(f"\\{n}-grams:")
        idx = rng.integers(0, len(vocab), size=(c, n))
        logp = rng.uniform(-4.0, -0.3, size=c)
        bo = rng.uniform(-1.0, -0.05, size=c)
        has_bo = n < order
        for i in range(c):
            gram = " ".join(vocab[j] for j in idx[i])
            if has_bo:
                lines.append(f"{logp[i]:.4f}\t{gram}\t{bo[i]:.4f}")
            else:
                lines.append(f"{logp[i]:.4f}\t{gram}")
        lines.append("")
    lines.append("\\end\\")
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-words", type=int, default=60000)
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--n-bigrams", type=int, default=600_000)
    ap.add_argument("--n-trigrams", type=int, default=1_200_000)
    ap.add_argument("--n-4grams", type=int, default=800_000)
    ap.add_argument("--n-5grams", type=int, default=500_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    words, lex_lines = gen_lexicon(rng, args.n_words)
    lex_path = os.path.join(args.out, "lexicon.txt")
    with open(lex_path, "w") as f:
        f.write("\n".join(lex_lines) + "\n")
    print(f"wrote {lex_path}: {len(words)} words, {len(lex_lines)} prons")

    counts = [args.n_bigrams, args.n_trigrams, args.n_4grams,
              args.n_5grams][: args.order - 1]
    arpa_lines = gen_arpa(rng, words, args.order, counts)
    arpa_path = os.path.join(args.out, f"lm_{args.order}gram.arpa")
    with open(arpa_path, "w") as f:
        f.write("\n".join(arpa_lines) + "\n")
    sz = os.path.getsize(arpa_path) / 1e6
    print(f"wrote {arpa_path}: order {args.order}, "
          f"{sum(counts) + len(words) + 3} n-grams, {sz:.1f} MB")


if __name__ == "__main__":
    main()
