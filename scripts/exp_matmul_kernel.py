"""Experiment: hand-written Pallas matmul vs XLA at the step's GEMM shapes.

BASELINE.md's round-2 step budget puts the two biggest items at 72-76% of
v5e bf16 peak under XLA: the layer-0 conv (an implicit [B*L, C*k=8192] x
[8192, 6144] GEMM) and the layer 1-4 input projections ([B*L, 2048] x
[2048, 6144]). The roadmap's one remaining single-chip lever is a
hand-written matmul kernel. Before building integration + VJPs, this
script answers the cheap gating question: **can a Pallas matmul beat XLA
on the plain GEMM at these exact shapes on this chip?**

Measures, per shape:
  * XLA jnp.dot (bf16 operands, f32 accumulate) — the production path's
    core op;
  * Pallas tiled matmul (bf16, f32 accumulate in VMEM scratch) over a
    (M/BM, N/BN, K/BK) grid, K innermost for accumulator reuse;
  * a small tile sweep to find the kernel's best operating point.

Run on the chip:  python scripts/exp_matmul_kernel.py
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def make_pallas_matmul(bm: int, bn: int, bk: int, vmem_mb: int = 96):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.float32
        )

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def matmul(a, b):
        m, k = a.shape
        _, n = b.shape
        return pl.pallas_call(
            kernel,
            grid=(m // bm, n // bn, k // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=vmem_mb * 1024 * 1024,
            ),
        )(a, b)

    return matmul


def bench(fn, a, b, iters=30):
    import jax.numpy as jnp

    out = fn(a, b)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + block (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a, b)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    # M = B*L at the bench shape (64 * 313 = 20032, padded to 20096 for
    # 128-tiling — XLA pads internally too); K/N from the production GEMMs.
    shapes = [
        # 20480 = 512*40: the whole tile sweep divides it (20096 = 2^7*157
        # divides nothing above bm=128 — first run skipped every tile).
        ("proj_l1-4", 20480, 2048, 6144),
        ("layer0_im2col", 20480, 8192, 6144),
        ("dW (KxM@MxN)", 2048, 20480, 6144),
    ]
    rng = np.random.default_rng(0)
    for name, m, k, n in shapes:
        a = jnp.asarray(
            rng.standard_normal((m, k)), jnp.bfloat16
        )
        b = jnp.asarray(
            rng.standard_normal((k, n)) * 0.02, jnp.bfloat16
        )
        tf = 2 * m * k * n / 1e12

        xla = jax.jit(
            functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        )
        xla_f = lambda a, b: xla(a, b).astype(jnp.bfloat16)
        ms = bench(xla_f, a, b, args.iters)
        print(f"{name}: XLA {ms:.2f} ms ({tf/ms*1e3:.0f} TF/s)", flush=True)

        ref = np.asarray(xla_f(a, b), np.float32)
        best = None
        for bm, bn, bk in [
            (512, 1024, 512),
            (512, 512, 1024),
            (1024, 512, 512),
            (256, 1024, 1024),
            (512, 1024, 1024),
            (512, 2048, 512),
        ]:
            if m % bm or n % bn or k % bk:
                continue
            try:
                f = make_pallas_matmul(bm, bn, bk)
                got = np.asarray(f(a, b), np.float32)
                err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
                assert err < 2e-2, f"mismatch {err}"
                ms_p = bench(f, a, b, args.iters)
            except Exception as e:  # noqa: BLE001 — sweep survives bad tiles
                print(f"  pallas bm{bm} bn{bn} bk{bk}: FAIL {type(e).__name__}: {e}",
                      flush=True)
                continue
            print(
                f"  pallas bm{bm} bn{bn} bk{bk}: {ms_p:.2f} ms "
                f"({tf/ms_p*1e3:.0f} TF/s)",
                flush=True,
            )
            if best is None or ms_p < best[0]:
                best = (ms_p, (bm, bn, bk))
        if best:
            print(
                f"{name}: best pallas {best[0]:.2f} ms {best[1]} "
                f"vs XLA {ms:.2f} ms -> "
                f"{'PALLAS WINS' if best[0] < ms else 'xla wins'}",
                flush=True,
            )


if __name__ == "__main__":
    main()
