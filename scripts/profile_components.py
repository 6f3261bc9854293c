"""Component-level timing on the real TPU chip (axon tunnel).

Times isolated pieces of the reference-scale train step so perf work
targets the real bottlenecks. Blocking is via host transfer (float())
because block_until_ready is a no-op through the tunnel.

Usage: python scripts/profile_components.py [section ...]
Sections: step gru conv dtypes
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
        jax.tree.leaves(r)[0].addressable_data(0)  # sync via
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


def _sync(r):
    import jax

    leaf = jax.tree.leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def main():
    import jax
    import jax.numpy as jnp

    sections = set(sys.argv[1:]) or {"step", "gru", "conv", "dtypes"}
    B, T, H, C = 64, 1280, 1024, 256
    L = (T - 32) // 4 + 1
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    if "step" in sections:
        from neural_speech_decoder_tpu.training.optim import make_optimizer
        from neural_speech_decoder_tpu.training.trainer import (
            build_model,
            make_train_step,
        )

        args = {
            "model_type": "gru_baseline", "nInputFeatures": C, "nClasses": 40,
            "nUnits": H, "nLayers": 5, "dropout": 0.4, "strideLen": 4,
            "kernelLen": 32, "gaussianSmoothWidth": 2.0, "bidirectional": True,
            "whiteNoiseSD": 0.8, "constantOffsetSD": 0.2, "lrStart": 0.02,
            "lrEnd": 0.02, "l2_decay": 1e-5, "nBatch": 10000, "seed": 0,
            "compute_dtype": "bfloat16", "watch_log_freq": 0,
        }
        model = build_model(args, n_days=24)
        params = model.init(jax.random.key(0))
        tx, _ = make_optimizer(args)
        state = {"params": params, "opt_state": tx.init(params),
                 "step": jnp.array(0)}
        step_fn = make_train_step(args, model, tx)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        y = jnp.asarray(rng.integers(1, 41, (B, 64)), jnp.int32)
        xl = jnp.asarray(rng.integers(400, T + 1, (B,)), jnp.int32)
        yl = jnp.asarray(rng.integers(20, 65, (B,)), jnp.int32)
        d = jnp.asarray(rng.integers(0, 24, (B,)), jnp.int32)
        key = jax.random.key(0)

        def run(state):
            s, m = step_fn(state, x, y, xl, yl, d, key)
            return s, m

        for _ in range(3):
            state, m = step_fn(state, x, y, xl, yl, d, key)
            float(m["train/loss"])
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, m = step_fn(state, x, y, xl, yl, d, key)
        float(m["train/loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"full train step: {dt*1e3:.2f} ms  ({B/dt:.1f} seq/s)")

    if "gru" in sections:
        from neural_speech_decoder_tpu.ops.pallas.gru_scan import gru_sequence

        for dt_ in (jnp.bfloat16,):
            xp = jnp.asarray(
                np.random.default_rng(0).standard_normal((L, 2, B, 3 * H)),
                dt_,
            )
            w = jnp.asarray(
                np.random.default_rng(1).standard_normal((2, H, 3 * H)) * 0.02,
                jnp.float32,
            )
            bb = jnp.zeros((2, 3 * H), jnp.float32)
            fwd = jax.jit(lambda xp, w, b: gru_sequence(xp, w, b))
            t = timeit(fwd, xp, w, bb)
            print(f"pallas gru fwd ({dt_.__name__}): {t*1e3:.2f} ms")

            def loss(xp, w, b):
                return jnp.sum(gru_sequence(xp, w, b).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t = timeit(g, xp, w, bb)
            print(f"pallas gru fwd+bwd ({dt_.__name__}): {t*1e3:.2f} ms")

    if "conv" in sections:
        from neural_speech_decoder_tpu.ops.unfold import unfold_matmul

        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        wbig = jnp.asarray(
            rng.standard_normal((C * 32, 6 * H)) * 0.01, jnp.bfloat16
        )
        f = jax.jit(lambda x, w: unfold_matmul(x, w, 32, 4))
        t = timeit(f, xs, wbig)
        fl = B * L * (C * 32) * (6 * H) * 2
        print(f"layer0 unfold_matmul fwd: {t*1e3:.2f} ms ({fl/t/1e12:.1f} TF/s)")

        def loss(x, w):
            return jnp.sum(unfold_matmul(x, w, 32, 4).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t = timeit(g, xs, wbig)
        print(f"layer0 unfold_matmul fwd+bwd: {t*1e3:.2f} ms "
              f"({3*fl/t/1e12:.1f} TF/s)")

    if "dtypes" in sections:
        rng = np.random.default_rng(0)
        M, K, N = B * L, C * 32, 6 * H
        a32 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        b32 = jnp.asarray(rng.standard_normal((K, N)) * 0.01, jnp.float32)
        fl = M * K * N * 2
        for dt_ in ("bfloat16", "float32"):
            a, b = a32.astype(dt_), b32.astype(dt_)
            f = jax.jit(
                lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
            )
            t = timeit(f, a, b)
            print(f"matmul {M}x{K}x{N} {dt_}: {t*1e3:.2f} ms ({fl/t/1e12:.1f} TF/s)")
        # int8 with f32 accumulation (v5e has native int8 MXU at 2x bf16)
        ai = jnp.asarray(
            np.clip(np.random.default_rng(0).standard_normal((M, K)) * 40, -127, 127
                    ).astype(np.int8))
        bi = jnp.asarray(
            np.clip(np.random.default_rng(1).standard_normal((K, N)) * 40, -127, 127
                    ).astype(np.int8))
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
        try:
            t = timeit(f, ai, bi)
            print(f"matmul int8->int32: {t*1e3:.2f} ms ({fl/t/1e12:.1f} TOP/s)")
        except Exception as e:
            print("int8 matmul failed:", type(e).__name__, str(e)[:120])
        try:
            a8 = a32.astype(jnp.float8_e4m3fn)
            b8 = b32.astype(jnp.float8_e4m3fn)
            f = jax.jit(lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32))
            t = timeit(f, a8, b8)
            print(f"matmul fp8 e4m3: {t*1e3:.2f} ms ({fl/t/1e12:.1f} TF/s)")
        except Exception as e:
            print("fp8 matmul failed:", type(e).__name__, str(e)[:120])


if __name__ == "__main__":
    main()
