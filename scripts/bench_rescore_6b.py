"""Reference-scale rescoring benchmark: OPT-6.7B-class JAX forward on TPU.

The reference rescores n-best lists with OPT-6.7B in 8-bit on a 32-80 GB
GPU node (``/root/reference/scripts/eval_competition.py:84-86,125-137``).
This benchmark proves the TPU-native engine (``decoding/llm_engine.py``)
runs the same pass at the same model scale on ONE 16 GB v5e chip and
measures sentences/s + peak HBM.

Parameters are synthesized *on device* (seeded; no 13 GB transfer or
download — the math/load paths are separately parity-tested at small
scale in ``tests/test_llm_engine.py``). Sentence batches mirror the
competition operating point: nbest=100 hypotheses of 3-12 words
(``eval_competition.py:110-116``), tokenized lengths padded to the
16-multiple bucket the production scorer uses.

Usage (real chip):
    python scripts/bench_rescore_6b.py --size 6.7b --dtype bf16
    python scripts/bench_rescore_6b.py --size 6.7b --dtype int8
    python scripts/bench_rescore_6b.py --size 13b  --dtype int8
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="6.7b",
                    choices=["125m", "350m", "1.3b", "2.7b", "6.7b", "13b"])
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--batch", type=int, default=32,
                    help="sentences per forward")
    ap.add_argument("--seqlen", type=int, default=16,
                    help="padded token length (competition n-best "
                         "hypotheses are 3-12 words → a 16 bucket)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="debug on CPU (use with a small --size)")
    ap.add_argument("--checkpoint", default=None,
                    help="load a real HF-layout checkpoint from this dir "
                         "(scripts/make_opt_checkpoint.py) via "
                         "stream_load_hf instead of synthesizing on "
                         "device; --size must match the config")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.decoding import llm_engine

    spec = llm_engine.opt_spec(args.size)
    bytes_per_param = 1 if args.dtype == "int8" else 2
    print(
        f"model: OPT-{args.size} ({spec.n_params/1e9:.2f}B params, "
        f"{args.dtype}, ~{spec.n_params*bytes_per_param/1e9:.1f} GB "
        f"weights)",
        file=sys.stderr,
    )

    t0 = time.time()
    load_info = {}
    if args.checkpoint:
        # Real-artifact path (round-4): stream the HF-layout checkpoint
        # from disk tensor-by-tensor — int8 legs quantize per layer INSIDE
        # the stream (full-precision stacks never materialize; one sweep,
        # ~int8-sized peak host RAM), then one device_put. This is the
        # path a user with the actual facebook/opt-6.7b artifact takes.
        params_host, spec2 = llm_engine.stream_load_hf(
            args.checkpoint, "bfloat16", quantize=(args.dtype == "int8")
        )
        assert (spec2.n_layer, spec2.d_model) == (spec.n_layer, spec.d_model)
        spec = spec2
        t_stream = time.time() - t0
        params = jax.device_put(params_host)
        del params_host
        import resource

        load_info = {
            "stream_quantize_s": round(t_stream, 1),
            "peak_host_rss_gb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
            ),
        }
    else:
        params = llm_engine.synth_params_on_device(
            spec, seed=0, dtype=jnp.bfloat16, quantize=(args.dtype == "int8")
        )
    # Force materialization via a host readback: block_until_ready is a
    # NO-OP through the remote axon tunnel, so sum one element per leaf
    # (device execution is in-order; reading later results fences earlier
    # work) and transfer the scalar.
    probe = sum(
        leaf.ravel()[0].astype(jnp.float32)
        for leaf in jax.tree.leaves(params)
    )
    float(probe)
    how = ("streamed from disk + quantized + transferred"
           if args.checkpoint else "synthesized on device")
    print(f"params {how} in {time.time()-t0:.1f}s", file=sys.stderr)

    b, t = args.batch, args.seqlen
    rng = np.random.default_rng(0)
    ids = rng.integers(0, spec.vocab, (b, t)).astype(np.int32)
    lens = rng.integers(max(2, t // 3), t + 1, (b,))
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.int32)

    fn = jax.jit(
        lambda p, i, m: llm_engine.engine_sentence_logprobs(
            p, spec, i, m, compute_dtype=jnp.bfloat16
        )
    )
    t0 = time.time()
    out = fn(params, ids, mask)
    first = float(np.asarray(out).sum())  # host readback = real block
    compile_s = time.time() - t0
    print(f"first call (compile+run): {compile_s:.1f}s, sum={first:.1f}",
          file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = fn(params, ids, mask)
        _ = float(np.asarray(out).sum())
        times.append(time.time() - t0)
    # median step; the axon tunnel adds a fixed ~31 ms readback — report
    # both raw and tunnel-corrected numbers.
    step = float(np.median(times))
    sent_s = b / step
    tok_s = b * t / step

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        mem = {
            "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 1e9, 2),
            "hbm_in_use_gb": round(stats.get("bytes_in_use", 0) / 1e9, 2),
        }
    except Exception:
        pass

    result = {
        **load_info,
        "from_disk": bool(args.checkpoint),
        "metric": f"rescore_{args.size}_{args.dtype}_sent_per_s",
        "value": round(sent_s, 1),
        "unit": "sent/s",
        "batch": b,
        "seqlen": t,
        "step_ms": round(step * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "n_params_b": round(spec.n_params / 1e9, 2),
        **mem,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
