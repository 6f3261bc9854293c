"""Experiment: tokens-constant bucketed batching (round 4).

The driver bench's bucketed legs hold B=64 for every bucket envelope, so
short-envelope steps under-fill the chip (the Conformer measured +7%
going B=64 -> B=128 at T=1280; the GRU measured -2%). Standard speech
practice sizes batches by a *token budget* instead: B_k = budget / T_k,
so every bucket's step moves the same activation volume.

This script measures full train steps (bench.bench_family — forward +
CTC + backward + optimizer on the real chip) at B_k = round8(64*1280 /
T_k) for each bucket envelope of both families and reports the
effective bucketed rate  eff = 1 / sum_k w_k / rate_k  (time per trial
weighted by bucket occupancy — B_k cancels, so fixed-B and
tokens-constant effectives are directly comparable).

Decision rule (CLAUDE.md): integration into the trainer/bench only if
the tokens-constant effective beats the same-session fixed-B effective
at full step; otherwise this file is the recorded NO-GAIN experiment.

Reference anchor: the reference trains at a fixed B=64
(``scripts/train_model.py:13``); bucketing itself is already our
divergence, this sizes it to the hardware.
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np

import bench


def round8(x: int) -> int:
    return max(8, (x // 8) * 8)


def run_family(name: str, args: dict, *, mult: int, budget_b: int = 64,
               flat_t: int = 1280, b_cap: int = 256) -> dict:
    # identical bucket construction to bench.bench_bucketed
    rng = np.random.default_rng(7)
    lens = np.clip(rng.normal(600, 200, size=4096), 100, flat_t)
    qs = np.quantile(lens, np.linspace(0, 1, 5)[1:])
    envelopes = sorted({int(-(-q // mult) * mult) for q in qs})
    edges = np.concatenate([[0], envelopes])
    weights = np.histogram(lens, bins=edges)[0] / len(lens)

    budget = budget_b * flat_t
    out = {"family": name, "buckets": []}
    inv_fixed = inv_tok = 0.0
    for t_env, w in zip(envelopes, weights):
        b_k = min(round8(budget // t_env), b_cap)
        rate_tok = bench.bench_family(args, b=b_k, t=t_env, n_steps=10)
        rate_fix = bench.bench_family(args, b=budget_b, t=t_env, n_steps=10)
        out["buckets"].append({
            "t": t_env, "w": round(float(w), 4), "b_tokens_const": b_k,
            "seq_per_s_fixed_b64": round(rate_fix, 1),
            "seq_per_s_tokens_const": round(rate_tok, 1),
        })
        inv_fixed += w / rate_fix
        inv_tok += w / rate_tok
        print(f"{name} T={t_env}: B=64 {rate_fix:.1f} | "
              f"B={b_k} {rate_tok:.1f} seq/s", file=sys.stderr, flush=True)
    out["eff_fixed_b64"] = round(1.0 / inv_fixed, 2)
    out["eff_tokens_const"] = round(1.0 / inv_tok, 2)
    out["tokens_const_gain"] = round(out["eff_tokens_const"]
                                     / out["eff_fixed_b64"], 4)
    return out


def main() -> None:
    results = []
    for name, args, mult in (
        ("conformer", bench.CONFORMER_ARGS, 128),
        ("gru", bench.GRU_ARGS, 32),
    ):
        results.append(run_family(name, args, mult=mult))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"experiment": "tokens_const_bucketing",
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
