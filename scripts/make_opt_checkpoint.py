"""Write a genuine HF-OPT-layout checkpoint to disk at any model size.

Network egress is blocked, so the published ``facebook/opt-6.7b`` artifact
cannot be downloaded — but its LAYOUT can be reproduced exactly: the same
tensor names (``model.decoder.layers.N.self_attn.q_proj.weight`` …), the
same nn.Linear ``[out, in]`` orientations, fp16 storage, sharded
safetensors with a ``model.safetensors.index.json`` weight map, and a
``config.json`` transformers would accept. Weights are seeded random
(scaled 0.02 like OPT's init) — throughput and loader-path validation
don't depend on weight values, and logit-level parity vs torch is pinned
separately on a transformers-``save_pretrained`` 125M checkpoint
(tests/test_opt_real_layout.py).

Used by ``bench_rescore_6b.py --checkpoint`` to measure the rescoring leg
loading REAL artifacts from disk instead of synthesizing on device
(round-3 VERDICT §2.2). Memory-bounded: tensors are generated and written
shard-by-shard (~4 GB each).

Usage: python scripts/make_opt_checkpoint.py --size 6.7b --out /tmp/opt67
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

SHARD_BYTES = 4 * 1024**3


def tensor_plan(size: str):
    """(name, shape) for every tensor of an OPT checkpoint, HF order."""
    from neural_speech_decoder_tpu.decoding.llm_engine import opt_spec

    spec = opt_spec(size)
    d, f, w = spec.d_model, spec.ffn_dim, spec.w_dim
    plan = [
        ("model.decoder.embed_tokens.weight", (spec.vocab, w)),
        ("model.decoder.embed_positions.weight",
         (spec.n_positions + spec.pos_offset, d)),
    ]
    if spec.word_dim is not None:
        # nn.Linear stores [out, in]: project_in maps w->d, project_out d->w
        plan += [("model.decoder.project_in.weight", (d, w)),
                 ("model.decoder.project_out.weight", (w, d))]
    plan += [("model.decoder.final_layer_norm.weight", (d,)),
             ("model.decoder.final_layer_norm.bias", (d,))]
    for i in range(spec.n_layer):
        p = f"model.decoder.layers.{i}."
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            plan += [(p + f"self_attn.{proj}.weight", (d, d)),
                     (p + f"self_attn.{proj}.bias", (d,))]
        plan += [
            (p + "self_attn_layer_norm.weight", (d,)),
            (p + "self_attn_layer_norm.bias", (d,)),
            (p + "fc1.weight", (f, d)), (p + "fc1.bias", (f,)),
            (p + "fc2.weight", (d, f)), (p + "fc2.bias", (d,)),
            (p + "final_layer_norm.weight", (d,)),
            (p + "final_layer_norm.bias", (d,)),
        ]
    return spec, plan


def write_checkpoint(size: str, out: str, seed: int = 0,
                     tensor_fn=None) -> None:
    """Write the artifact. ``tensor_fn(name, shape) -> array | None``
    overrides individual tensors (None falls back to the random init) —
    used by the bigram-LM construction (decoding/bigram_opt.py) to emit a
    checkpoint with *designed* weights in the exact same layout."""
    from safetensors.numpy import save_file

    spec, plan = tensor_plan(size)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "config.json"), "w") as fh:
        json.dump({
            "model_type": "opt",
            "hidden_size": spec.d_model,
            "ffn_dim": spec.ffn_dim,
            "num_hidden_layers": spec.n_layer,
            "num_attention_heads": spec.n_head,
            "vocab_size": spec.vocab,
            "max_position_embeddings": spec.n_positions,
            "word_embed_proj_dim": spec.w_dim,
            "do_layer_norm_before": True,
            "activation_function": "relu",
            "torch_dtype": "float16",
        }, fh, indent=2)

    rng = np.random.default_rng(seed)
    shard, shard_bytes, shards, weight_map, total = {}, 0, [], {}, 0

    def flush():
        nonlocal shard, shard_bytes
        if not shard:
            return
        name = f"model-{len(shards):05d}.safetensors"
        save_file(shard, os.path.join(out, name), metadata={"format": "pt"})
        shards.append(name)
        for k in shard:
            weight_map[k] = name
        shard, shard_bytes = {}, 0

    for name, shape in plan:
        n = int(np.prod(shape))
        arr = tensor_fn(name, shape) if tensor_fn is not None else None
        if arr is not None:
            assert tuple(arr.shape) == tuple(shape), (name, arr.shape, shape)
            arr = np.ascontiguousarray(arr, np.float16)
        elif name.endswith("norm.weight"):
            arr = np.ones(shape, np.float16)
        elif name.endswith(".bias") or name.endswith("norm.bias"):
            arr = np.zeros(shape, np.float16)
        else:
            arr = (rng.standard_normal(n, dtype=np.float32) * 0.02).astype(
                np.float16).reshape(shape)
        total += arr.nbytes
        shard[name] = arr
        shard_bytes += arr.nbytes
        if shard_bytes >= SHARD_BYTES:
            flush()
    flush()

    # Single-file checkpoints use the unsharded name; sharded ones get
    # transformers' "model-XXXXX-of-YYYYY.safetensors" pattern + index map.
    if len(shards) == 1:
        os.rename(os.path.join(out, shards[0]),
                  os.path.join(out, "model.safetensors"))
    else:
        n = len(shards)
        final = {
            old: f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            for i, old in enumerate(shards)
        }
        for old, new in final.items():
            os.rename(os.path.join(out, old), os.path.join(out, new))
        weight_map = {k: final[v] for k, v in weight_map.items()}
        with open(os.path.join(out, "model.safetensors.index.json"),
                  "w") as fh:
            json.dump({"metadata": {"total_size": total},
                       "weight_map": weight_map}, fh)
    print(json.dumps({
        "size": size, "out": out, "n_shards": max(len(shards), 1),
        "total_gb": round(total / 1e9, 2),
        "n_params_b": round(spec.n_params / 1e9, 2),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="6.7b")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    write_checkpoint(a.size, a.out, a.seed)
