"""Component-isolation profiler for the Conformer train step.

Times each sub-module of the reference-config Conformer
(``scripts/train_conformer.py:7-8``: 8 blocks, d=1024, ff=2048, H=8,
B=64, T=1280 -> T'=313) as its own jitted fwd+bwd subgraph at the exact
production shapes, so the 173.5 ms step budget can be attributed
kernel-by-kernel (the ablation profiler ``profile_conformer.py`` changes
the model; this one doesn't).

Timing notes (axon tunnel): block via a host transfer (float()), never
block_until_ready.  Usage: python scripts/profile_conformer_parts.py
[name-filter ...]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from neural_speech_decoder_tpu.models.conformer import (
    ConformerConfig,
    _attention,
    _block,
    _conv_module,
    _ff_module,
    _init_block,
    conformer_frontend,
    init_conformer_params,
)

B, T, TP = 64, 1280, 313  # reference envelope; T' = (1280-32)//4 + 1
D, FF, H = 1024, 2048, 8

CFG = ConformerConfig(compute_dtype=jnp.bfloat16)


def timeit(fn, *args, n=20, warmup=3):
    fn = jax.jit(fn)
    for _ in range(warmup):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - start) / n * 1e3  # ms


def grad_through(fn):
    """Scalar-loss wrapper so fwd+bwd of `fn` is timed (sum-of-out loss)."""

    def wrapped(params, *args):
        def loss(p):
            out = fn(p, *args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        l, g = jax.value_and_grad(loss)(params)
        return l, g

    return wrapped


def main():
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, TP, D)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(90, TP + 1, size=(B,)), jnp.int32)
    pad_mask = jnp.arange(TP)[None, :] >= lens[:, None]
    dkey = jax.random.key(1, impl="rbg")

    bp = _init_block(key, CFG)

    results = {}

    def run(name, ms_fn):
        sel = sys.argv[1:]
        if sel and not any(s in name for s in sel):
            return
        try:
            ms = ms_fn()
            results[name] = ms
            print(f"{name:46s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:46s} FAILED {type(e).__name__}: {e}", flush=True)

    # --- single block, fwd only then fwd+bwd ---
    run("block fwd (train, x8 = full encoder)", lambda: timeit(
        lambda p, x: _block(p, CFG, x, pad_mask, lens, dkey, True), bp, x))
    run("block fwd+bwd (train)", lambda: timeit(
        grad_through(lambda p, x: _block(p, CFG, x, pad_mask, lens, dkey,
                                         True)), bp, x))

    # --- FF module ---
    run("ff fwd+bwd (x16 = full)", lambda: timeit(
        grad_through(lambda p, x: _ff_module(p, x, dkey, CFG.dropout, True)),
        bp["ff1"], x))
    run("ff fwd+bwd no-dropout", lambda: timeit(
        grad_through(lambda p, x: _ff_module(p, x, None, CFG.dropout, False)),
        bp["ff1"], x))

    # --- bare FF matmul pair (roofline probe) ---
    w1 = jnp.asarray(rng.standard_normal((D, FF)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((FF, D)), jnp.bfloat16)

    def ff_bare(ws, x):
        w1, w2 = ws
        h = jnp.einsum("btd,df->btf", x, w1,
                       preferred_element_type=jnp.float32)
        h = jax.nn.silu(h).astype(x.dtype)
        return jnp.einsum("btf,fd->btd", h, w2,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    run("ff bare matmul pair fwd+bwd", lambda: timeit(
        grad_through(ff_bare), (w1, w2), x))

    # --- attention (fused kernel path) ---
    run("attention fwd+bwd (fused)", lambda: timeit(
        grad_through(lambda p, x: _attention(p, CFG, x, pad_mask, lens,
                                             dkey, True)), bp["attn"], x))
    cfg_naive = ConformerConfig(compute_dtype=jnp.bfloat16,
                                fused_attention=False)
    run("attention fwd+bwd (naive einsum)", lambda: timeit(
        grad_through(lambda p, x: _attention(p, cfg_naive, x, pad_mask,
                                             lens, dkey, True)),
        bp["attn"], x))

    # --- conv module ---
    run("conv module fwd+bwd", lambda: timeit(
        grad_through(lambda p, x: _conv_module(p, x, dkey, CFG.dropout,
                                               True)), bp["conv"], x))

    def dw_only(w, h):
        kernel = w[:, None, :]
        return jax.lax.conv_general_dilated(
            h, kernel.astype(h.dtype), window_strides=(1,),
            padding=[(15, 15)], dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=h.shape[-1])

    run("depthwise conv k=31 alone fwd+bwd", lambda: timeit(
        grad_through(dw_only), bp["conv"]["dw_w"], x))

    # --- frontend + losses + optimizer at production shapes ---
    params = init_conformer_params(key, cfg=CFG)
    xin = jnp.asarray(rng.standard_normal((B, T, 256)), jnp.float32)
    run("frontend fwd+bwd", lambda: timeit(
        grad_through(lambda p, xin: conformer_frontend(
            p, CFG, xin.astype(jnp.bfloat16), dkey, True)), params, xin))

    from neural_speech_decoder_tpu.ops.ctc import ctc_loss

    logits = jnp.asarray(rng.standard_normal((B, TP, 41)), jnp.float32)
    y = jnp.asarray(rng.integers(1, 41, size=(B, 64)), jnp.int32)
    y_lens = jnp.asarray(rng.integers(20, 65, size=(B,)), jnp.int32)

    def ctc_fn(logits):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(ctc_loss(lp, lens, y, y_lens))

    run("CTC loss fwd+bwd", lambda: timeit(
        lambda lg: jax.value_and_grad(ctc_fn)(lg), logits))

    # optimizer: AdamW over the full param tree
    import optax

    tx = optax.adamw(4e-4, eps=1e-6, weight_decay=1e-3)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    def opt_fn(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    run("AdamW update (full tree)", lambda: timeit(
        opt_fn, params, opt_state, grads))

    if results:
        blk = results.get("block fwd+bwd (train)")
        if blk is not None:
            print(f"\n8 x block fwd+bwd = {8 * blk:.1f} ms")


if __name__ == "__main__":
    main()
