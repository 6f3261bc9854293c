"""Full-step A/B: fused conv-module Pallas kernel ON vs OFF in the bf16
Conformer training step, back-to-back in one process on the same chip.

Round-3 retired the conv-module kernel by corollary from the fused-FFN
no-gain result; round-4's verdict required the corollary be replaced with
a measured full-step number (isolated module timings overstate the XLA
twin — only full-step A/Bs decide fusion questions, BASELINE.md r4 rule).
Also prints the isolated-module timing for completeness.

Run: timeout 1800 python scripts/exp_conv_module_fullstep_ab.py [--b 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from bench import CONFORMER_ARGS, bench_family  # noqa: E402


def isolated_module(fused: bool, b: int = 64, tp: int = 313,
                    d: int = 1024, kw: int = 31, n: int = 20) -> float:
    """Isolated fwd+bwd ms of the conv module at reference scale."""
    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.models.conformer import (
        ConformerConfig,
        _conv_module,
        _init_conv_module,
    )

    cfg = ConformerConfig(compute_dtype=jnp.bfloat16,
                          fused_conv=bool(fused), conv_kernel=kw)
    p = _init_conv_module(jax.random.key(0), d, kw, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (b, tp, d), jnp.bfloat16)
    key = jax.random.key(2)

    @jax.jit
    def step(p, x):
        def loss(p):
            out = _conv_module(p, x, key, 0.1, True, cfg=cfg)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        return l, g

    for _ in range(3):
        l, g = step(p, x)
        float(l)
    t0 = time.perf_counter()
    for _ in range(n):
        l, g = step(p, x)
    float(l)
    return (time.perf_counter() - t0) / n * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-isolated", action="store_true")
    args = ap.parse_args()

    if not args.skip_isolated:
        for arm, fused in (("off", False), ("on", True)):
            ms = isolated_module(fused, b=args.b)
            print(json.dumps({
                "metric": f"conv_module_isolated_{arm}",
                "b": args.b, "value": round(ms, 2), "unit": "ms fwd+bwd",
            }), flush=True)

    results = {"off": [], "on": []}
    for rep in range(args.reps):
        for arm, flag in (("off", False), ("on", True)):
            fam_args = dict(CONFORMER_ARGS, fused_conv=flag)
            seq_s = bench_family(fam_args, b=args.b, n_steps=10)
            results[arm].append(round(seq_s, 2))
            print(json.dumps({
                "metric": f"conformer_fullstep_fused_conv_{arm}",
                "rep": rep, "b": args.b, "value": round(seq_s, 2),
                "unit": "seq/s",
            }), flush=True)

    best_off, best_on = max(results["off"]), max(results["on"])
    print(json.dumps({
        "metric": "conformer_fullstep_conv_module_ab",
        "b": args.b,
        "off_seq_per_s": results["off"],
        "on_seq_per_s": results["on"],
        "best_off": best_off,
        "best_on": best_on,
        "on_vs_off": round(best_on / best_off, 4),
        "verdict": "fused-conv-wins" if best_on > best_off * 1.01
        else ("no-gain" if best_on > best_off * 0.99 else "regression"),
    }), flush=True)


if __name__ == "__main__":
    main()
