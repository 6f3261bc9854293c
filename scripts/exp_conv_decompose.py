"""Experiment: layer-0 conv as shift-sum matmuls (stride | kernel).

The GRU layer-0 input projection is a strided conv
``[B,1280,256] ⊛ [32,256,6144] stride 4`` that XLA sustains at ~76-79% of
bf16 peak (BASELINE.md round-2 step budget) — the largest single item in
the 124 ms step (36 ms fwd+bwd). Because the stride (4) divides the
kernel (32), the conv decomposes exactly into G = k/s = 8 *pure* matmuls
over a bin-grouped input:

    xg = reshape(x, [B, T/s, s·C])           # group bins by stride
    out[l] = Σ_{g<G} xg[l + g] @ Wg          # Wg: [s·C, O]

Each term is a [B·T', s·C=1024] × [1024, 6144] GEMM — the canonical MXU
shape — at the cost of G overlapping reads of the grouped input
(~0.4 ms/direction of extra HBM traffic at this scale, vs a hoped-for
~20% MXU-efficiency gain if XLA's implicit-GEMM conv lowering is the
bottleneck).

This script measures fwd and fwd+bwd for (a) the production
``unfold_matmul`` conv form and (b) the shift-sum form, after asserting
exact (fp32) / close (bf16) equivalence. Run on the chip:

    python scripts/exp_conv_decompose.py [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def shift_sum_matmul(x, weight, kernel: int, stride: int):
    """``unfold(x) @ weight`` as k/s shifted pure matmuls.

    x: [B, T, C]; weight: [C*k, O] (torch-unfold layout, row c*k + j).
    Requires kernel % stride == 0 and T % stride == 0.
    """
    import jax.numpy as jnp

    b, t, c = x.shape
    o = weight.shape[-1]
    g_n = kernel // stride
    l = (t - kernel) // stride + 1
    # group bins by stride: xg[b, p, j*C + c] = x[b, p*s + j, c]
    xg = x.reshape(b, t // stride, stride * c)
    # weight rows are c*k + j (channel-major); term g needs bins
    # j in [g*s, (g+1)*s) for all channels: W3[c, j, o] -> Wg[(j%s)*C + c, o]
    w3 = weight.reshape(c, kernel, o)
    out = None
    for g in range(g_n):
        wg = (
            w3[:, g * stride: (g + 1) * stride, :]
            .transpose(1, 0, 2)  # [s, C, O], bin-major like xg's groups
            .reshape(stride * c, o)
        )
        term = jnp.einsum(
            "blf,fo->blo", xg[:, g: g + l, :], wg.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        out = term if out is None else out + term
    return out.astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.ops.unfold import unfold_matmul

    b, t, c, o, k, s = args.b, args.t, 256, 6144, 32, 4
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w32 = jnp.asarray(rng.standard_normal((c * k, o)) * 0.01, jnp.float32)

    # correctness (fp32 close; both accumulate f32)
    ref = np.asarray(unfold_matmul(x32, w32, k, s))
    got = np.asarray(shift_sum_matmul(x32, w32, k, s))
    err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"rel err fp32: {err:.2e}", file=sys.stderr)
    assert err < 1e-5

    x = x32.astype(jnp.bfloat16)
    w = w32.astype(jnp.bfloat16)

    def bench(fn, name):
        f = jax.jit(fn)
        g = jax.jit(jax.grad(lambda w: jnp.sum(fn_w(fn, x, w) ** 2)))
        float(jnp.sum(f(x, w).astype(jnp.float32)))  # compile+block
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(x, w)
        float(jnp.sum(out.astype(jnp.float32)))
        fwd_ms = (time.perf_counter() - t0) / args.iters * 1e3
        float(jnp.sum(g(w).astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            gw = g(w)
        float(jnp.sum(gw.astype(jnp.float32)))
        tot_ms = (time.perf_counter() - t0) / args.iters * 1e3
        tf = 2 * b * ((t - k) // s + 1) * (c * k) * o / 1e12
        print(f"{name}: fwd {fwd_ms:.2f} ms ({tf/fwd_ms*1e3:.0f} TF/s), "
              f"fwd+bwd {tot_ms:.2f} ms", flush=True)
        return fwd_ms, tot_ms

    def fn_w(fn, x, w):
        return fn(x, w)

    conv = lambda x, w: unfold_matmul(x, w, k, s)
    shift = lambda x, w: shift_sum_matmul(x, w, k, s)
    a = bench(conv, "conv (production)")
    bsh = bench(shift, "shift-sum matmuls")
    print({"conv_fwd_ms": round(a[0], 2), "conv_total_ms": round(a[1], 2),
           "shift_fwd_ms": round(bsh[0], 2),
           "shift_total_ms": round(bsh[1], 2)})


if __name__ == "__main__":
    main()
