"""Follow-up: tokens-constant bucketing with B_k rounded to multiples
of 64 (round 4).

The round8 variant (exp_tokens_const_bucketing.py) measured: Conformer
eff +3.1%, GRU eff -13.7% — the GRU's B=104/168 cells cratered (-22%/
-37%) while its B=128 cell gained +9.3%. The bidirectional scan's
recurrent matmuls have M = 2·B rows, so any B not a multiple of 64
leaves the 128-row MXU tile partially filled at every one of the 2·T
scan steps; the Conformer's [B·T, D] GEMMs flatten batch into a huge M
and barely care. Hypothesis: round B_k DOWN to a multiple of 64 (floor
at 64 = the reference batch) fixes the GRU and may help the Conformer.

Only the cells not covered by the round8 run are measured fresh; known
rates are hard-coded from that run's JSON (same session, same chip).
"""

import json
import sys

sys.path.insert(0, ".")

import bench

# (family, T, weight, fixed-B64 rate) from exp_tokens_const_bucketing.py
KNOWN = {
    ("gru", 608, 128): 1050.4,
    ("gru", 736, 64): 847.4,
    ("gru", 1248, 64): 531.6,
    ("conformer", 640, 128): 832.4,
    ("conformer", 1280, 64): 405.9,
}
BUCKETS = {
    "gru": [(480, 0.2839), (608, 0.2449), (736, 0.2295), (1248, 0.2417)],
    "conformer": [(512, 0.334), (640, 0.2598), (768, 0.209),
                  (1280, 0.1973)],
}
EFF_FIXED = {"gru": 827.15, "conformer": 682.51}


def round64(budget_b: int, t_env: int, flat_t: int = 1280) -> int:
    return max(64, (budget_b * flat_t // t_env) // 64 * 64)


def main() -> None:
    out = {"experiment": "tokens_const_round64", "results": []}
    for name, args in (("gru", bench.GRU_ARGS),
                       ("conformer", bench.CONFORMER_ARGS)):
        inv = 0.0
        cells = []
        for t_env, w in BUCKETS[name]:
            b_k = round64(64, t_env)
            rate = KNOWN.get((name, t_env, b_k))
            if rate is None:
                rate = bench.bench_family(args, b=b_k, t=t_env, n_steps=10)
                print(f"{name} T={t_env} B={b_k}: {rate:.1f} seq/s",
                      file=sys.stderr, flush=True)
            cells.append({"t": t_env, "b": b_k, "seq_per_s": round(rate, 1)})
            inv += w / rate
        eff = round(1.0 / inv, 2)
        out["results"].append({
            "family": name, "cells": cells, "eff_round64": eff,
            "eff_fixed_b64": EFF_FIXED[name],
            "gain": round(eff / EFF_FIXED[name], 4),
        })
        print(json.dumps(out["results"][-1]), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
