"""Build the competition-scale demo: data + decode artifacts + rescorer.

Produces everything a *reference-operating-point* ``nsd-eval-competition``
run needs, with CONSTRUCTED AMBIGUITY so the LLM-rescoring leg has real
work to do (round-5 VERDICT #2):

  * a 60k-word lexicon (CMUdict-like pronunciation statistics) in which a
    large fraction of corpus words have an out-of-corpus HOMOPHONE —
    acoustically indistinguishable, so the WFST beam must keep both;
  * a ground-truth bigram language model over a 2,000-word corpus
    vocabulary; sentences for the dataset are sampled from it;
  * a word-structured formatted dataset (reference pickle schema):
    24 train days + test split + a >=1,000-utterance competition
    partition at 256 channels — features are phone templates + noise, so
    the reference GRU recipe learns to decode the phones but cannot
    disambiguate homophones;
  * a deliberately FLATTENED 5-gram ARPA (probabilities ^gamma,
    gamma < 1) for the WFST decoder — informative but weak, like a small
    n-gram LM next to a large neural LM;
  * an OPT-layout checkpoint (default 6.7b, the reference rescorer scale)
    whose weights exactly realize the sharpened TRUE bigram
    (decoding/bigram_opt.py) + its word-level tokenizer — the rescorer
    that resolves what the WFST leaves ambiguous.

Usage:
  python scripts/make_competition_scale_demo.py --out scratch/comp_demo \
      [--opt-size 6.7b] [--corpus-words 2000] [--lexicon-words 60000] \
      [--competition-utts 1050]
"""

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_decode_artifacts import gen_lexicon, make_word  # noqa: E402

from neural_speech_decoder_tpu.data.phonemes import (  # noqa: E402
    MAX_SEQ_LEN,
    PHONE_DEF,
    phone_to_id,
)
from neural_speech_decoder_tpu.decoding.bigram_opt import (  # noqa: E402
    BigramOptBuilder,
    build_wordlevel_tokenizer,
)


def build_bigram(rng, k: int, branch: float = 0.3, floor: float = 0.03):
    """[K+1, K] log P: row 0 = BOS context. Sparse Dirichlet transitions
    (few strong successors per context) + uniform smoothing."""
    p = rng.dirichlet(np.full(k, branch), size=k + 1)
    p = (1 - floor) * p + floor / k
    return np.log(p / p.sum(axis=1, keepdims=True))


def sample_sentence(rng, logp, min_w=4, max_w=8):
    p = np.exp(logp)
    n = int(rng.integers(min_w, max_w + 1))
    out = [int(rng.choice(logp.shape[1], p=p[0]))]
    for _ in range(n - 1):
        out.append(int(rng.choice(logp.shape[1], p=p[1 + out[-1]])))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--opt-size", default="6.7b")
    ap.add_argument("--corpus-words", type=int, default=2000)
    ap.add_argument("--lexicon-words", type=int, default=60000)
    ap.add_argument("--homophone-frac", type=float, default=0.5,
                    help="fraction of corpus words given an out-of-corpus "
                         "homophone (identical pronunciation)")
    ap.add_argument("--train-days", type=int, default=24)
    ap.add_argument("--train-per-day", type=int, default=48)
    ap.add_argument("--test-per-day", type=int, default=12)
    ap.add_argument("--competition-days", type=int, default=15)
    ap.add_argument("--competition-utts", type=int, default=1050)
    ap.add_argument("--lm-gamma", type=float, default=0.3,
                    help="WFST ARPA flattening exponent (probabilities "
                         "^gamma renormalized): <1 keeps the n-gram LM "
                         "weaker than the bigram rescorer")
    ap.add_argument("--lm-sigma", type=float, default=0.5,
                    help="log10-domain noise on the ARPA's n-gram "
                         "probabilities — models the small-corpus "
                         "estimation error that makes a WFST n-gram "
                         "mis-rank homophones where the (true-bigram) "
                         "rescorer does not; 0 disables")
    ap.add_argument("--n-trigrams", type=int, default=0,
                    help="chain-sampled higher-order ARPA entries "
                         "(reference-scale LM size; 0 = token entries)")
    ap.add_argument("--n-4grams", type=int, default=0)
    ap.add_argument("--n-5grams", type=int, default=0)
    ap.add_argument("--n-channels", type=int, default=256)
    ap.add_argument("--signal-scale", type=float, default=3.0)
    ap.add_argument("--noise-scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-opt", action="store_true",
                    help="skip writing the OPT checkpoint (tests)")
    cli = ap.parse_args()

    rng = np.random.default_rng(cli.seed)
    os.makedirs(cli.out, exist_ok=True)
    k = cli.corpus_words

    # ---- lexicon with homophone decoys -----------------------------------
    words, lex_lines = gen_lexicon(rng, cli.lexicon_words)
    pron = {}
    for line in lex_lines:
        w, ph = line.split(None, 1)
        if "(" not in w:
            pron.setdefault(w, ph.split())
    corpus = words[:k]
    decoys = {}
    used = set(words)
    n_homo = int(k * cli.homophone_frac)
    for w in corpus[:n_homo]:
        d = make_word(rng)
        while d in used:
            d = make_word(rng)
        used.add(d)
        decoys[w] = d
        lex_lines.append(f"{d}  {' '.join(pron[w])}")
        pron[d] = pron[w]
    rng.shuffle(lex_lines)
    lex_path = os.path.join(cli.out, "lexicon.txt")
    with open(lex_path, "w") as f:
        f.write("\n".join(lex_lines) + "\n")

    # ---- ground-truth bigram + dataset -----------------------------------
    logp = build_bigram(rng, k)
    np.savez_compressed(os.path.join(cli.out, "bigram.npz"),
                        logp=logp, corpus=np.asarray(corpus))

    templates = rng.standard_normal((41, cli.n_channels)).astype(np.float32)
    sil = phone_to_id("SIL") + 1

    def make_day(n_utts):
        sd, ph, pl, tr = [], [], [], []
        for _ in range(n_utts):
            widx = sample_sentence(rng, logp)
            ids = []
            for wi in widx:
                ids += [phone_to_id(p) + 1 for p in pron[corpus[wi]]]
                ids.append(sil)
            t_per = rng.integers(6, 10, size=len(ids))
            t = int(t_per.sum())
            x = cli.noise_scale * rng.standard_normal(
                (t, cli.n_channels)).astype(np.float32)
            pos = 0
            for c, tp in zip(ids, t_per):
                x[pos : pos + tp] += cli.signal_scale * templates[c]
                pos += tp
            buf = np.zeros(MAX_SEQ_LEN, np.int32)
            buf[: len(ids)] = ids[:MAX_SEQ_LEN]
            sd.append(x)
            ph.append(buf)
            pl.append(min(len(ids), MAX_SEQ_LEN))
            tr.append(" ".join(corpus[wi] for wi in widx))
        return {
            "sentenceDat": sd,
            "phonemes": ph,
            "phoneLens": np.asarray(pl),
            "transcriptions": tr,
            "timeSeriesLens": np.asarray([x.shape[0] for x in sd]),
        }

    comp_per_day = -(-cli.competition_utts // cli.competition_days)
    ds = {
        "train": [make_day(cli.train_per_day)
                  for _ in range(cli.train_days)],
        "test": [make_day(cli.test_per_day) for _ in range(cli.train_days)],
        "competition": [make_day(comp_per_day)
                        for _ in range(cli.competition_days)],
    }
    ds_path = os.path.join(cli.out, "dataset.pkl")
    with open(ds_path, "wb") as f:
        pickle.dump(ds, f, protocol=4)

    # ---- flattened 5-gram ARPA -------------------------------------------
    g = cli.lm_gamma
    flat = np.exp(logp * g)
    flat /= flat.sum(axis=1, keepdims=True)
    vocab = ["<s>", "</s>", "<unk>"] + list(words) + list(decoys.values())
    # unigram mass: corpus words get their (flattened) stationary mass,
    # every other word — including every decoy — a uniform floor, so the
    # WFST treats decoys as perfectly plausible words.
    uni = np.full(len(vocab), 1e-6)
    pi = np.exp(logp[0] * g)
    # corpus words are words[:k] -> vocab positions 3..3+k
    uni[3 : 3 + k] = pi / pi.sum()
    # homophone decoys get unigram mass comparable to their source word
    # (real homophones are real words with real frequencies) — without
    # this the WFST's unigram term crushes them and no ambiguity
    # survives to the rescorer (measured: top-1 WER 3% instead of ~15%)
    decoy_list = list(decoys.values())
    for j, (src, _) in enumerate(decoys.items()):
        uni[3 + len(words) + j] = uni[3 + corpus.index(src)] * 0.8
    uni /= uni.sum()
    top = max(8, int(0.02 * k))
    lines = ["\\data\\", f"ngram 1={len(vocab)}"]
    bigram_lines = []
    for row in range(k + 1):
        ctx = "<s>" if row == 0 else corpus[row - 1]
        for v in np.argsort(flat[row])[::-1][:top]:
            lp = np.log10(flat[row][v]) + rng.normal(0.0, cli.lm_sigma)
            bigram_lines.append(f"{lp:.4f}\t{ctx} {corpus[v]}\t-0.30")
            # a homophone decoy is a real word with real (independently
            # mis-estimated) bigram stats: acoustically the two paths tie
            # exactly, so whenever the noisy small-LM estimate ranks the
            # decoy above the source the WFST top-1 is WRONG — and only
            # the true-bigram rescorer (which scores the decoy at
            # -oov_penalty) can fix it. This is the constructed-ambiguity
            # mechanism: n-gram estimation error vs a neural LM.
            d = decoys.get(corpus[v])
            if d is not None:
                lpd = (np.log10(flat[row][v] * 0.8)
                       + rng.normal(0.0, cli.lm_sigma))
                bigram_lines.append(f"{lpd:.4f}\t{ctx} {d}\t-0.30")
    lines += [f"ngram 2={len(bigram_lines)}",
              "ngram 3=1", "ngram 4=1", "ngram 5=1", ""]
    lines.append("\\1-grams:")
    for w, p in zip(vocab, uni):
        lines.append(f"{np.log10(p):.4f}\t{w}\t-0.30")
    lines += ["", "\\2-grams:"]
    lines += bigram_lines
    # Higher orders at reference scale: n-grams SAMPLED from the true
    # chain with probabilities consistent with the bigram factorization
    # (γ-flattened + the same estimation noise) — they add realistic
    # size/lookup load without extra information (the corpus is Markov),
    # keeping the deliberate small-LM weakness rescoring must beat.
    cum = np.cumsum(np.exp(logp), axis=1)
    log10e = 1.0 / np.log(10)
    for order, count in ((3, cli.n_trigrams), (4, cli.n_4grams),
                         (5, cli.n_5grams)):
        lines += ["", f"\\{order}-grams:"]
        if count <= 0:
            # single token entry keeps the file a format-valid 5-gram
            c0, c1 = corpus[0], corpus[int(np.argmax(flat[1]))]
            toks = " ".join(([c0, c1] * 3)[:order])
            lines.append(f"-1.0000\t{toks}" + ("\t-0.30" if order < 5
                                               else ""))
            continue
        # vectorized chain walk (chunked: the per-step [chunk, K] compare
        # matrix is the working set)
        seqs = np.empty((count, order), np.int64)
        seqs[:, 0] = rng.integers(0, k, size=count)
        for t in range(1, order):
            u = rng.random(count)
            for c0 in range(0, count, 100_000):
                c1 = min(c0 + 100_000, count)
                rows = cum[1 + seqs[c0:c1, t - 1]]
                seqs[c0:c1, t] = (rows > u[c0:c1, None]).argmax(axis=1)
        seqs = np.unique(seqs, axis=0)
        lp = (
            g * log10e
            * sum(logp[1 + seqs[:, t - 1], seqs[:, t]]
                  for t in range(1, order))
            + rng.normal(0.0, cli.lm_sigma, size=len(seqs))
        )
        carr = np.asarray(corpus)
        tail = "\t-0.30" if order < 5 else ""
        for row, l10 in zip(seqs, lp):
            lines.append(f"{l10:.4f}\t{' '.join(carr[row])}{tail}")
        for li, l in enumerate(lines):
            if l == f"ngram {order}=1":
                lines[li] = f"ngram {order}={len(seqs)}"
                break
    lines += ["", "\\end\\"]
    arpa_path = os.path.join(cli.out, "lm_5gram.arpa")
    with open(arpa_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    # ---- tokenizer + bigram-OPT artifact ---------------------------------
    opt_dir = os.path.join(cli.out, f"opt_{cli.opt_size}_bigram")
    # tokenizer vocab: corpus words first (ids 4..4+k-1 = logp columns),
    # then decoys + remaining lexicon words up to the OPT vocab budget
    from neural_speech_decoder_tpu.decoding.llm_engine import opt_spec

    spec = opt_spec(cli.opt_size)
    rest = list(decoys.values()) + [w for w in words[k:]]
    tok_words = (corpus + rest)[: spec.vocab - 4]
    build_wordlevel_tokenizer(tok_words, opt_dir)
    if not cli.skip_opt:
        from make_opt_checkpoint import write_checkpoint

        builder = BigramOptBuilder(
            spec, logp, np.arange(k) + 4  # corpus ids start at 4
        )
        write_checkpoint(cli.opt_size, opt_dir,
                         tensor_fn=builder.tensor_fn)

    manifest = {
        "dataset": ds_path,
        "lexicon": lex_path,
        "arpa": arpa_path,
        "opt_dir": opt_dir,
        "bigram": os.path.join(cli.out, "bigram.npz"),
        "corpus_words": k,
        "homophones": len(decoys),
        "lexicon_entries": len(lex_lines),
        "competition_utts": comp_per_day * cli.competition_days,
        "lm_gamma": g,
        "lm_sigma": cli.lm_sigma,
        "opt_size": cli.opt_size,
        "seed": cli.seed,
    }
    with open(os.path.join(cli.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
