"""Full-step A/B: hand-tiled Pallas matmul (ops/pallas/matmul.py) ON vs OFF
in the bf16 GRU training step, measured back-to-back in one process on the
same chip — the measurement round 3 landed the default-on gate WITHOUT
(VERDICT.md round-3 weak #1: BENCH_r03 440 seq/s vs BENCH_r02 516).

Uses bench.py's exact config/harness so the numbers are driver-comparable.
Prints one JSON line per arm and a verdict line.

Run: timeout 1200 python scripts/exp_matmul_fullstep_ab.py [--b 64]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from bench import GRU_ARGS, bench_family  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2,
                    help="interleaved repetitions per arm (tunnel noise)")
    args = ap.parse_args()

    results = {"off": [], "on": []}
    # Interleave arms so tunnel drift hits both equally.
    for rep in range(args.reps):
        for arm, flag in (("off", False), ("on", True)):
            fam_args = dict(GRU_ARGS, use_pallas_matmul=flag)
            seq_s = bench_family(fam_args, b=args.b)
            results[arm].append(round(seq_s, 2))
            print(json.dumps({
                "metric": f"gru_fullstep_pallas_matmul_{arm}",
                "rep": rep, "b": args.b, "value": round(seq_s, 2),
                "unit": "seq/s",
            }), flush=True)

    best_off, best_on = max(results["off"]), max(results["on"])
    print(json.dumps({
        "metric": "gru_fullstep_matmul_ab",
        "b": args.b,
        "off_seq_per_s": results["off"],
        "on_seq_per_s": results["on"],
        "best_off": best_off,
        "best_on": best_on,
        "on_vs_off": round(best_on / best_off, 4),
        "verdict": "pallas-matmul-wins" if best_on > best_off * 1.01
        else ("no-gain" if best_on > best_off * 0.99 else "regression"),
    }), flush=True)


if __name__ == "__main__":
    main()
