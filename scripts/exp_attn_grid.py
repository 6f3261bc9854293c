"""Microbench: fused-MHSA kernel grid-overhead attribution.

The profiler shows attention fwd+bwd at 8.89 ms/block against a ~3 ms
matmul floor. Candidate costs: (a) the B*H=512-program grid's per-program
dispatch, (b) the [B,T,3D] -> [B,H,T,dh] head-split transposes + pad
around the kernel, (c) the kernel math itself. This times each piece on
the chip at production shapes (B=64, H=8, T'=313 -> Tp=384, dh=128).

Usage: python scripts/exp_attn_grid.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from neural_speech_decoder_tpu.ops.pallas.attention_kernel import fused_mhsa

B, H, T, DH = 64, 8, 313, 128


def timeit(fn, *args, n=30, warmup=3):
    fn = jax.jit(fn)
    for _ in range(warmup):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - start) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, DH)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, DH)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, DH)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(90, T + 1, size=(B,)), jnp.int32)
    key = jax.random.key(0, impl="rbg")

    ms = timeit(lambda q, k, v: fused_mhsa(q, k, v, lens, None), q, k, v)
    print(f"kernel fwd only (no dropout)            {ms:7.2f} ms", flush=True)

    ms = timeit(
        lambda q, k, v: fused_mhsa(q, k, v, lens, key, dropout_rate=0.3,
                                   train=True), q, k, v)
    print(f"kernel fwd only (dropout 0.3)           {ms:7.2f} ms", flush=True)

    def fb(q, k, v):
        def loss(q, k, v):
            o = fused_mhsa(q, k, v, lens, key, dropout_rate=0.3, train=True)
            return jnp.sum(o.astype(jnp.float32))
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        return l, g

    ms = timeit(fb, q, k, v)
    print(f"kernel fwd+bwd (dropout 0.3)            {ms:7.2f} ms", flush=True)

    # head-split transpose cost alone: [B,T,3D] -> 3x [B,H,T,dh]
    x = jnp.asarray(rng.standard_normal((B, T, 3 * H * DH)), jnp.bfloat16)

    def split_heads(x):
        q, k, v = jnp.split(x, 3, axis=-1)

        def heads(z):
            return z.reshape(B, T, H, DH).transpose(0, 2, 1, 3)

        return heads(q), heads(k), heads(v)

    ms = timeit(split_heads, x)
    print(f"head-split transposes alone             {ms:7.2f} ms", flush=True)

    # pure XLA batched attention math (no mask/dropout) as the math floor
    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32)

    ms = timeit(xla_attn, q, k, v)
    print(f"XLA einsum attention fwd (no mask)      {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
