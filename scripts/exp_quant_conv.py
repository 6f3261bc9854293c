"""Quantized layer-0 projection experiment (ROADMAP: fp8/int8 conv).

The GRU's largest single matmul is the layer-0 unfold projection
[B·T′, 8192] × [8192, 3072] (×2 directions), ~36 ms fwd+bwd at B=64 —
already ~76% of v5e bf16 peak. This experiment measures whether a
lower-precision MXU path could beat it on this hardware:

  * bf16 (the production path),
  * int8×int8→int32 (v5e has native double-rate int8 MXU),
  * float8_e4m3fn (no native fp8 on v5e — XLA emulates),

at the exact production shape. Prints one line per dtype; findings go to
BASELINE.md. This is a measurement harness, not a training-path change:
int8 quantized training would also need scale management + QAT to hold
PER parity, which is only worth building if the kernel-level win is real.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 64 * 313, 8192, 3072


def bench(make_args, matmul, name, n_iter=30):
    args = make_args()
    f = jax.jit(matmul)
    out = f(*args)
    jnp.sum(out.astype(jnp.float32)).block_until_ready()
    float(jnp.sum(out.astype(jnp.float32)))  # tunnel-safe sync
    start = time.perf_counter()
    for _ in range(n_iter):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - start) / n_iter
    tflops = 2 * M * K * N / dt / 1e12
    print(f"{name:24s} {dt * 1e3:7.2f} ms  {tflops:7.1f} TF/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    a32 = rng.standard_normal((M, K)).astype(np.float32)
    b32 = rng.standard_normal((K, N)).astype(np.float32)

    def mk(dt):
        return lambda: (jnp.asarray(a32, dt), jnp.asarray(b32, dt))

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    bench(mk(jnp.bfloat16), mm, "bf16")
    try:
        def mm_i8(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        def mk_i8():
            qa = np.clip(a32 * 10, -127, 127).astype(np.int8)
            qb = np.clip(b32 * 10, -127, 127).astype(np.int8)
            return jnp.asarray(qa), jnp.asarray(qb)

        bench(mk_i8, mm_i8, "int8 -> int32")
    except Exception as e:
        print(f"int8: unsupported ({type(e).__name__}: {e})")
    try:
        bench(mk(jnp.float8_e4m3fn), mm, "float8_e4m3fn")
    except Exception as e:
        print(f"fp8: unsupported ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
