"""Explain the GRU B=128 deficit (round-5 VERDICT #5).

BENCH_r04: B=128 runs 506 seq/s vs 517 at B=64 — yet round 1 measured
B=128 FASTER (373 vs 344) and the tokens-constant sweep shows B=128
winning at short envelopes. This script times the full step AND its
components at both batch sizes on the chip, per-sequence, so the loss
can be attributed to a specific piece (projection tiling? scan? HBM
working set?) and recorded in BASELINE.md next to the driver-guarded
leg.

Run: timeout 1800 python scripts/exp_b128_deficit.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import GRU_ARGS, bench_family  # noqa: E402

T = 1280
TP = (T - 32) // 4 + 1  # unfold frames


def _time(fn, *args, n=10, warmup=3):
    import jax

    for _ in range(warmup):
        r = fn(*args)
        leaf = jax.tree.leaves(r)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    leaf = jax.tree.leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return (time.perf_counter() - t0) / n * 1e3


def components(b: int) -> dict:
    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.ops.pallas.gru_scan import gru_sequence

    rng = np.random.default_rng(0)
    out = {}

    # layer-0 input projection as the production conv (implicit GEMM):
    # [B, T, 256] -> [B, T', 3H*2dirs] with k=32, s=4
    w_conv = jnp.asarray(
        rng.standard_normal((32 * 256, 6144)) * 0.01, jnp.bfloat16
    ).reshape(32, 256, 6144)
    x_raw = jnp.asarray(rng.standard_normal((b, T, 256)), jnp.bfloat16)

    @jax.jit
    def conv_fwd_bwd(x, w):
        def loss(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(4,), padding=[(0, 0)],
                dimension_numbers=("NTC", "TIO", "NTC"),
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
        return l, g

    out["layer0_conv_ms"] = _time(conv_fwd_bwd, x_raw, w_conv)

    # one scan layer fwd+bwd (production Pallas kernel), M = 2B rows
    xp = jnp.asarray(
        rng.standard_normal((TP, 2, b, 3 * 1024)) * 0.1, jnp.bfloat16
    ).reshape(TP, 2 * b, 3 * 1024)
    w_hh = jnp.asarray(rng.standard_normal((1024, 3 * 1024)) * 0.01,
                       jnp.bfloat16)
    b_hh = jnp.zeros((3 * 1024,), jnp.float32)

    @jax.jit
    def scan_fwd_bwd(xp, w):
        def loss(xp, w):
            ys = gru_sequence(xp, w, b_hh)
            return jnp.sum(ys.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(xp, w)
        return l, g

    out["scan_layer_ms"] = _time(scan_fwd_bwd, xp, w_hh)

    # one layer-1..4 projection: [B*T', 2048] x [2048, 6144]
    h_in = jnp.asarray(rng.standard_normal((b * TP, 2048)) * 0.1,
                       jnp.bfloat16)
    w_p = jnp.asarray(rng.standard_normal((2048, 6144)) * 0.01, jnp.bfloat16)

    @jax.jit
    def proj_fwd_bwd(h, w):
        def loss(h, w):
            return jnp.sum((h @ w).astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(h, w)
        return l, g

    out["projection_ms"] = _time(proj_fwd_bwd, h_in, w_p)
    return out


def main():
    res = {}
    for b in (64, 128):
        seq_s = bench_family(GRU_ARGS, b=b, n_steps=10)
        res[b] = {"full_step_seq_s": round(seq_s, 2),
                  "full_step_ms_per_seq": round(1000.0 * b / seq_s / b, 4),
                  "full_step_ms": round(1000.0 * b / seq_s, 2)}
        comp = components(b)
        res[b].update({k: round(v, 3) for k, v in comp.items()})
        # per-seq normalization for comparability
        res[b]["per_seq_ms"] = {
            k: round(v / b, 4) for k, v in comp.items()
        }
        print(json.dumps({"b": b, **res[b]}), flush=True)

    r64, r128 = res[64], res[128]
    print(json.dumps({
        "metric": "gru_b128_deficit_attribution",
        "full_ratio_per_seq": round(
            (r128["full_step_ms"] / 128) / (r64["full_step_ms"] / 64), 4
        ),
        "component_ratios_per_seq": {
            k: round(r128["per_seq_ms"][k] / r64["per_seq_ms"][k], 4)
            for k in r64["per_seq_ms"]
        },
    }), flush=True)


if __name__ == "__main__":
    main()
