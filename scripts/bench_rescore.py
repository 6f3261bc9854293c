"""Benchmark: n-best LLM rescoring throughput, JAX-on-TPU vs torch-on-CPU.

Builds a GPT-2-small-scale (12L/768d/12H, ~124M param) random-init local
checkpoint, scores a synthetic n-best sweep (sentences of 3-12 words) with
both engines, and prints sentences/second for each. The JAX engine is
``decoding/jax_lm.py`` (the default in the competition CLI); the torch
engine is the ``rescore.hf_causal_scorer`` fallback path.

Usage: python scripts/bench_rescore.py [--n 512] [--layers 12] [--dim 768]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def build_ckpt(d, layers, dim, heads):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel, GPT2TokenizerFast

    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    vocab.update({" ": 26, "<|endoftext|>": 27, "Ġ": 28})
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = GPT2TokenizerFast(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt"),
        unk_token="<|endoftext|>", pad_token="<|endoftext|>",
    )
    torch.manual_seed(0)
    model = GPT2LMHeadModel(GPT2Config(
        vocab_size=len(vocab), n_positions=128, n_embd=dim, n_layer=layers,
        n_head=heads,
    ))
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))
    n_params = sum(p.numel() for p in model.parameters())
    return str(d), n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    import tempfile
    from pathlib import Path

    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        path, n_params = build_ckpt(
            Path(td), args.layers, args.dim, args.heads
        )
        print(f"checkpoint: {n_params/1e6:.1f}M params", file=sys.stderr)

        rng = np.random.default_rng(0)
        words = ["the", "cat", "sat", "on", "a", "mat", "dogs", "run",
                 "fast", "and", "slow", "birds", "sing"]
        sents = [
            " ".join(rng.choice(words, size=rng.integers(3, 13)))
            for _ in range(args.n)
        ]

        from neural_speech_decoder_tpu.decoding.jax_lm import jax_causal_scorer

        jscore = jax_causal_scorer(path, batch_size=args.batch)
        jscore(sents[:args.batch])  # compile
        t0 = time.perf_counter()
        js = jscore(sents)
        t_jax = time.perf_counter() - t0

        out = {
            "metric": "rescore_sentences_per_s",
            "jax_tpu": round(args.n / t_jax, 1),
        }
        if not args.skip_torch:
            from neural_speech_decoder_tpu.decoding.rescore import (
                hf_causal_scorer,
            )

            tscore = hf_causal_scorer(path, batch_size=args.batch)
            t0 = time.perf_counter()
            ts = tscore(sents)
            t_torch = time.perf_counter() - t0
            out["torch_cpu"] = round(args.n / t_torch, 1)
            out["speedup"] = round(t_torch / t_jax, 1)
            # engines agree (bf16 jax vs fp32 torch -> loose tolerance)
            err = float(np.max(np.abs(np.asarray(js) - np.asarray(ts))))
            out["max_abs_diff"] = round(err, 3)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
