"""Reference-scale causal-LM rescoring engine (OPT-6.7B-class on one TPU).

The reference's rescoring pass is OPT-6.7B loaded in 8-bit through
torch + bitsandbytes on a large GPU (``eval_competition.py:84-86``).
``decoding/jax_lm.py`` proves the scoring math and is the parity oracle,
but its loader materializes the entire checkpoint as a single fp32 torch
model before conversion — fine at 85M parameters, a wall at 6.7B (26.8 GB
fp32 on host, 13.4 GB bf16 on a 16 GB v5e). This module is the
production-scale path:

  * **Streamed loading** (``stream_load_hf``): the checkpoint is read
    tensor-by-tensor (safetensors, or torch ``.bin`` with ``mmap=True``)
    and each tensor is cast to the target dtype immediately; layer leaves
    are written straight into preallocated stacked ``[L, ...]`` arrays.
    Peak host memory stays ≈ one tensor above the final pytree and fp32 is
    never materialized for the whole model.
  * **int8 weight-only quantization** (``quantize_int8``): per-output-
    channel symmetric scales on every matmul weight. Halves HBM (a 6.7B
    model drops to ~6.7 GB) so 13B-class models fit a single v5e chip,
    and — since n-best rescoring at B·T ≈ 1-2k tokens is weight-
    *bandwidth* bound, not FLOP bound — roughly halves the per-batch
    weight traffic. Mirrors the reference's 8-bit setting.
  * **Tensor-parallel shardings** (``llm_shardings`` / ``shard_params``):
    Megatron-style head-parallel attention + column/row-parallel MLP over
    a ``jax.sharding.Mesh`` axis. The forward is plain jnp under ``jit``;
    GSPMD inserts the all-reduces. Validated for logit parity against the
    single-device forward on the 8-virtual-device CPU mesh
    (``tests/test_llm_engine.py``).

Engine parameter layout (head-major, TP-friendly — differs from
``jax_lm``'s fused ``[D, 3D]`` so that sharding the last axis keeps whole
heads local):

  blocks (stacked ``[L, ...]``):
    ln1_g/ln1_b/ln2_g/ln2_b [D]
    wqkv [D, 3, D]  bqkv [3, D]     (axis 1 = q/k/v)
    wo   [D, D]     bo   [D]
    wfc  [D, F]     bfc  [F]
    wproj[F, D]     bproj[D]
  top: wte [V, W], wpe [P, D], lnf_g/lnf_b [D], optional win [W, D] /
  wout [D, W] for OPT's split word/hidden dims (350m-style).

int8 leaves replace a float weight ``w`` with ``w_q`` (int8) + ``w_s``
(f32 per-output-channel scale, broadcastable against the matmul output).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# One copy of the LN/activation primitives: the engine's forward is
# documented (and parity-tested) as identical math to
# jax_lm._forward_logits, so diverging private copies would break the
# oracle relationship silently.
from .jax_lm import _act, _layer_norm

__all__ = [
    "EngineSpec",
    "OPT_SIZES",
    "opt_spec",
    "stream_load_hf",
    "from_jax_lm",
    "quantize_int8",
    "synth_params",
    "synth_params_on_device",
    "engine_forward_logits",
    "engine_sentence_logprobs",
    "llm_shardings",
    "shard_params",
    "engine_scorer",
]


@dataclasses.dataclass(frozen=True)
class EngineSpec:
    """Architecture of an OPT-family decoder (``eval_competition.py:84``)."""

    n_layer: int
    d_model: int
    ffn_dim: int
    n_head: int
    vocab: int = 50272
    n_positions: int = 2048
    word_dim: int | None = None  # != d_model only for the 350m-style split
    activation: str = "relu"
    pos_offset: int = 2  # OPTLearnedPositionalEmbedding offset
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @property
    def w_dim(self) -> int:
        return self.word_dim or self.d_model

    @property
    def n_params(self) -> int:
        d, f, v = self.d_model, self.ffn_dim, self.vocab
        per_layer = 4 * d * d + 2 * d * f + 3 * d + d + f + d + 4 * d
        return self.n_layer * per_layer + v * self.w_dim + (
            self.n_positions + self.pos_offset
        ) * d + 2 * d


# OPT model family dims (Zhang et al. 2022, table 1) — the reference uses
# the 6.7b row (``/root/reference/scripts/eval_competition.py:84-86``).
OPT_SIZES: dict[str, tuple[int, int, int, int, int | None]] = {
    "125m": (12, 768, 3072, 12, None),
    "350m": (24, 1024, 4096, 16, 512),
    "1.3b": (24, 2048, 8192, 32, None),
    "2.7b": (32, 2560, 10240, 32, None),
    "6.7b": (32, 4096, 16384, 32, None),
    "13b": (40, 5120, 20480, 40, None),
}


def opt_spec(size: str) -> EngineSpec:
    l, d, f, h, w = OPT_SIZES[size]
    return EngineSpec(n_layer=l, d_model=d, ffn_dim=f, n_head=h, word_dim=w)


# ---------------------------------------------------------------------------
# Streamed checkpoint loading
# ---------------------------------------------------------------------------


def _weight_files(path: str) -> list[str]:
    """Checkpoint weight files in load order (single or sharded-index)."""
    for idx_name in ("model.safetensors.index.json",
                     "pytorch_model.bin.index.json"):
        idx = os.path.join(path, idx_name)
        if os.path.exists(idx):
            with open(idx) as f:
                names = sorted(set(json.load(f)["weight_map"].values()))
            return [os.path.join(path, n) for n in names]
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return [p]
    raise FileNotFoundError(f"no weight files found under {path}")


def _iter_tensors(file: str):
    """Yield ``(name, np.ndarray)`` one tensor at a time (no whole-model
    materialization). safetensors reads are zero-copy mmap slices; torch
    ``.bin`` files load with ``mmap=True`` and convert per-tensor."""
    if file.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(file, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)
    else:
        import torch

        try:
            sd = torch.load(file, map_location="cpu", mmap=True,
                            weights_only=True)
        except TypeError:  # older torch: no mmap kwarg
            sd = torch.load(file, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, np.asarray(t.detach().to(torch.float32))


def _spec_from_config(path: str) -> EngineSpec:
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    if cfg.get("model_type") != "opt":
        raise NotImplementedError(
            "stream_load_hf covers the OPT family (the reference's "
            "rescorer, eval_competition.py:84); use "
            "jax_lm.load_causal_lm for GPT-2-class checkpoints"
        )
    if not cfg.get("do_layer_norm_before", True):
        raise NotImplementedError("post-LN OPT variants are not supported")
    d = cfg["hidden_size"]
    w = cfg.get("word_embed_proj_dim", d)
    return EngineSpec(
        n_layer=cfg["num_hidden_layers"],
        d_model=d,
        ffn_dim=cfg["ffn_dim"],
        n_head=cfg["num_attention_heads"],
        vocab=cfg["vocab_size"],
        n_positions=cfg["max_position_embeddings"],
        word_dim=None if w == d else w,
        activation=cfg.get("activation_function", "relu"),
    )


def _alloc_engine_params(spec: EngineSpec, dtype, skip=()) -> dict:
    l, d, f = spec.n_layer, spec.d_model, spec.ffn_dim
    blocks = {
        "ln1_g": np.empty((l, d), dtype), "ln1_b": np.empty((l, d), dtype),
        "ln2_g": np.empty((l, d), dtype), "ln2_b": np.empty((l, d), dtype),
        "wqkv": np.empty((l, d, 3, d), dtype),
        "bqkv": np.empty((l, 3, d), dtype),
        "wo": np.empty((l, d, d), dtype), "bo": np.empty((l, d), dtype),
        "wfc": np.empty((l, d, f), dtype), "bfc": np.empty((l, f), dtype),
        "wproj": np.empty((l, f, d), dtype), "bproj": np.empty((l, d), dtype),
    }
    for name in skip:
        del blocks[name]
    out = {
        "wte": np.empty((spec.vocab, spec.w_dim), dtype),
        "wpe": np.empty((spec.n_positions + spec.pos_offset, d), dtype),
        "lnf_g": np.empty((d,), dtype), "lnf_b": np.empty((d,), dtype),
        "blocks": blocks,
    }
    if spec.word_dim is not None:
        out["win"] = np.empty((spec.w_dim, d), dtype)
        out["wout"] = np.empty((d, spec.w_dim), dtype)
    return out


def stream_load_hf(path: str, param_dtype: str = "bfloat16",
                   quantize: bool = False):
    """Load an OPT-family HF checkpoint into the engine layout, one tensor
    at a time, casting to ``param_dtype`` at read time.

    Returns ``(params, spec)`` — numpy pytree (host) ready for
    ``jax.device_put`` / ``shard_params``. See the module docstring for
    why this replaces ``jax_lm.load_causal_lm`` at reference scale.

    With ``quantize=True`` the four block matmul weights are int8-quantized
    *in the stream*: each layer's slice is staged in ``param_dtype``, fed
    through ``_quant_leaf`` the moment its source tensors have all arrived,
    and the staging freed — so the full-precision [L, ...] stacks are never
    materialized. Bit-identical to ``quantize_int8(stream_load_hf(path))``
    (the chunked two-pass quantizer already reduces per layer), but peak
    host memory falls from bf16-tree + int8-copies (~20 GB at 6.7B) to
    ~the int8 output (+ embeddings), and the quantize pass rides the same
    single sweep over the shard files.
    """
    import ml_dtypes

    spec = _spec_from_config(path)
    dtype = np.dtype(
        ml_dtypes.bfloat16 if param_dtype == "bfloat16" else param_dtype
    )
    params = _alloc_engine_params(
        spec, dtype, skip=_QUANT_LEAVES if quantize else ()
    )
    blocks = params["blocks"]
    staging: dict = {}
    pending = {}  # (leaf, layer) -> writes still expected
    if quantize:
        l, d, f = spec.n_layer, spec.d_model, spec.ffn_dim
        for name, shape, s_shape in (
            ("wqkv", (l, d, 3, d), (l, 3, 1, d)),
            ("wo", (l, d, d), (l, 1, d)),
            ("wfc", (l, d, f), (l, 1, f)),
            ("wproj", (l, f, d), (l, 1, d)),
        ):
            blocks[name + "_q"] = np.empty(shape, np.int8)
            blocks[name + "_s"] = np.empty(s_shape, np.float32)

    def _stage(name: str, li: int):
        """Per-layer staging slice for a quantized leaf (lazy-alloc)."""
        key = (name, li)
        if key not in staging:
            shape = blocks[name + "_q"].shape[1:]
            staging[key] = np.empty(shape, dtype)
            pending[key] = 3 if name == "wqkv" else 1
        return staging[key]

    def _maybe_quantize(name: str, li: int):
        key = (name, li)
        pending[key] -= 1
        if pending[key]:
            return
        w = staging.pop(key)
        del pending[key]
        if name == "wqkv":  # [D,3,D] -> in axis next to out (see
            q, s = _quant_leaf(np.moveaxis(w, 0, 1))  # quantize_int8)
            blocks["wqkv_q"][li] = np.moveaxis(q, 0, 1)
        else:
            q, s = _quant_leaf(w)
            blocks[name + "_q"][li] = q
        blocks[name + "_s"][li] = s
    qkv_slot = {"q_proj": 0, "k_proj": 1, "v_proj": 2}
    top_map = {
        "model.decoder.embed_tokens.weight": "wte",
        "model.decoder.embed_positions.weight": "wpe",
        "model.decoder.final_layer_norm.weight": "lnf_g",
        "model.decoder.final_layer_norm.bias": "lnf_b",
        "model.decoder.project_in.weight": "win",
        "model.decoder.project_out.weight": "wout",
    }
    leaf_map = {
        "self_attn_layer_norm.weight": "ln1_g",
        "self_attn_layer_norm.bias": "ln1_b",
        "final_layer_norm.weight": "ln2_g",
        "final_layer_norm.bias": "ln2_b",
        "self_attn.out_proj.weight": "wo",
        "self_attn.out_proj.bias": "bo",
        "fc1.weight": "wfc", "fc1.bias": "bfc",
        "fc2.weight": "wproj", "fc2.bias": "bproj",
    }
    n_written = 0
    for file in _weight_files(path):
        for name, arr in _iter_tensors(file):
            # Normalize checkpoint-prefix variants to OPTForCausalLM's
            # "model.decoder.*": OPTModel saves "decoder.*", a bare
            # OPTDecoder saves "layers.*"/"embed_tokens.*".
            if name == "lm_head.weight":  # tied to wte
                continue
            if name.startswith("decoder."):
                name = "model." + name
            elif not name.startswith("model."):
                name = "model.decoder." + name
            if name in top_map:
                dst = top_map[name]
                if dst in ("win", "wout"):
                    params[dst][...] = arr.T.astype(dtype)
                else:
                    params[dst][...] = arr.astype(dtype)
                n_written += 1
                continue
            if not name.startswith("model.decoder.layers."):
                continue
            rest = name[len("model.decoder.layers."):]
            li_s, leaf = rest.split(".", 1)
            li = int(li_s)
            proj = leaf.split(".")[1] if leaf.startswith("self_attn.") else ""
            if proj in qkv_slot:
                slot = qkv_slot[proj]
                if leaf.endswith(".weight"):
                    if quantize:
                        _stage("wqkv", li)[:, slot, :] = arr.T.astype(dtype)
                        _maybe_quantize("wqkv", li)
                    else:
                        blocks["wqkv"][li, :, slot, :] = arr.T.astype(dtype)
                else:
                    blocks["bqkv"][li, slot, :] = arr.astype(dtype)
            else:
                dst = leaf_map[leaf]
                a = arr.astype(dtype)
                # nn.Linear stores [out, in]; engine matmuls are x @ W
                if quantize and dst in _QUANT_LEAVES:
                    _stage(dst, li)[...] = a.T
                    _maybe_quantize(dst, li)
                else:
                    blocks[dst][li] = (
                        a.T if dst in ("wo", "wfc", "wproj") else a
                    )
            n_written += 1
    # Completeness check: params start as np.empty — a naming mismatch
    # that silently skipped tensors would otherwise score with
    # uninitialized memory.
    expected = spec.n_layer * 16 + 4 + (2 if spec.word_dim else 0)
    if n_written != expected:
        raise ValueError(
            f"checkpoint at {path} filled {n_written}/{expected} engine "
            f"tensors — unrecognized parameter naming scheme"
        )
    if staging:  # a (leaf, layer) never saw all its source tensors
        raise ValueError(
            f"checkpoint at {path} left {sorted(staging)} staged but "
            f"never completed — duplicate/missing qkv tensors?"
        )
    return params, spec


def from_jax_lm(params: dict, spec_like) -> tuple[dict, EngineSpec]:
    """Convert a ``jax_lm.load_causal_lm`` pytree (fused ``[D, 3D]`` qkv)
    into the engine's head-major layout — the bridge used by tests to pin
    the two forwards against each other."""
    b = params["blocks"]
    l, d, _ = b["wo"].shape
    out_blocks = {
        "ln1_g": np.asarray(b["ln1_g"]), "ln1_b": np.asarray(b["ln1_b"]),
        "ln2_g": np.asarray(b["ln2_g"]), "ln2_b": np.asarray(b["ln2_b"]),
        "wqkv": np.asarray(b["wqkv"]).reshape(l, d, 3, d),
        "bqkv": np.asarray(b["bqkv"]).reshape(l, 3, d),
        "wo": np.asarray(b["wo"]), "bo": np.asarray(b["bo"]),
        "wfc": np.asarray(b["wfc"]), "bfc": np.asarray(b["bfc"]),
        "wproj": np.asarray(b["wproj"]), "bproj": np.asarray(b["bproj"]),
    }
    out = {
        "wte": np.asarray(params["wte"]),
        "wpe": np.asarray(params["wpe"]),
        "lnf_g": np.asarray(params["lnf_g"]),
        "lnf_b": np.asarray(params["lnf_b"]),
        "blocks": out_blocks,
    }
    if "win" in params:
        out["win"] = np.asarray(params["win"])
        out["wout"] = np.asarray(params["wout"])
    spec = EngineSpec(
        n_layer=l,
        d_model=d,
        ffn_dim=out_blocks["wfc"].shape[-1],
        n_head=spec_like.n_head,
        vocab=out["wte"].shape[0],
        n_positions=spec_like.n_positions,
        word_dim=out["wte"].shape[1] if "win" in out else None,
        activation=spec_like.activation,
        pos_offset=spec_like.pos_offset,
        ln_eps=spec_like.ln_eps,
    )
    return out, spec


# ---------------------------------------------------------------------------
# int8 weight-only quantization (reference runs OPT in 8-bit)
# ---------------------------------------------------------------------------

_QUANT_LEAVES = ("wqkv", "wo", "wfc", "wproj")


def _quant_leaf(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8. ``w``: [..., in, out]-ish with
    the *output* (channel) axis last; scale broadcasts over all others.

    Processes leading-axis chunks with in-place fp32 ops: at 6.7B scale a
    whole-leaf expression chain allocates several multi-GB fp32
    temporaries per op (wqkv alone is 1.6B elements), which measured
    565 s of the from-disk load budget (BASELINE.md); chunking bounds the
    working set to ~1 GB and single-passes the arithmetic. The reduction
    axis (-2) is inside each chunk, so chunking the leading axis is
    exact."""
    w = np.asarray(w)
    if w.ndim < 2:  # pragma: no cover - engine weights are all >=2D
        raise ValueError("quantization expects >=2D weights")
    q = np.empty(w.shape, np.int8)
    scale = np.empty(w.shape[:-2] + (1,) + w.shape[-1:], np.float32)
    if w.ndim == 2:  # leading axis IS the reduction axis — never split it
        step = w.shape[0]
    else:
        step = max(1, int(2**28) // max(int(np.prod(w.shape[1:])), 1))
    for i in range(0, w.shape[0], step):
        # astype(copy=True): np.asarray on an already-fp32 leaf returns a
        # VIEW, and the in-place ops below would corrupt the caller's
        # params tree (or crash on read-only device buffers).
        w32 = w[i : i + step].astype(np.float32)
        amax = np.max(np.abs(w32), axis=-2, keepdims=True)
        s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        np.divide(w32, s, out=w32)
        np.rint(w32, out=w32)
        np.clip(w32, -127, 127, out=w32)
        q[i : i + step] = w32
        scale[i : i + step] = s
    return q, scale


def quantize_int8(params: dict) -> dict:
    """Replace every block matmul weight with ``(w_q int8, w_s f32)``.

    Embeddings / norms / biases stay in the float dtype: they are small,
    and the fp32 logit head (``jax_lm`` note) needs full-precision wte.
    """
    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = dict(params["blocks"])
    for name in _QUANT_LEAVES:
        w = blocks.pop(name)
        # wqkv is [L, D, 3, D]: in axis is 1, out is (2,3) — move in next
        # to out so the shared helper's axis convention holds.
        if name == "wqkv":
            q, s = _quant_leaf(np.moveaxis(np.asarray(w), 1, 2))
            blocks[name + "_q"] = np.moveaxis(q, 2, 1)
            blocks[name + "_s"] = s  # [L, 3, 1, D] — broadcasts on out
        else:
            q, s = _quant_leaf(np.asarray(w))
            blocks[name + "_q"] = q
            blocks[name + "_s"] = s
    out["blocks"] = blocks
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------




def _deq(p: dict, name: str, cdt):
    """Fetch a block weight, dequantizing int8 leaves on the fly. The
    convert+scale fuses into the consumer matmul's operand read under XLA;
    the int8 copy is what lives in (and streams from) HBM."""
    if name + "_q" in p:
        q = p[name + "_q"].astype(cdt)
        s = p[name + "_s"]
        if name == "wqkv":  # scale stored [3, 1, D] against [D, 3, D]
            s = jnp.moveaxis(s, 0, 1)
        return q * s.astype(cdt)
    return p[name].astype(cdt)


def engine_forward_logits(params, spec: EngineSpec, ids, mask, compute_dtype):
    """[B, T] ids/mask -> [B, T, V] fp32 logits (causal + padding mask).

    Identical math to ``jax_lm._forward_logits`` (parity-tested); differs
    only in the head-major qkv layout and optional int8 dequant.
    """
    b, t = ids.shape
    cdt = compute_dtype
    x = params["wte"].astype(cdt)[ids]
    if "win" in params:
        x = x @ params["win"].astype(cdt)
    x = x + params["wpe"][spec.pos_offset: spec.pos_offset + t].astype(cdt)
    n_head, dh, d = spec.n_head, spec.head_dim, spec.d_model
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    attn_ok = causal[None, :, :] & (mask > 0)[:, None, :]

    def block(x, p):
        h = _layer_norm(x, p["ln1_g"], p["ln1_b"], spec.ln_eps).astype(cdt)
        qkv = (
            jnp.einsum("btd,dcf->btcf", h, _deq(p, "wqkv", cdt),
                       preferred_element_type=jnp.float32)
            + p["bqkv"].astype(jnp.float32)
        ).astype(cdt)

        def heads(z):
            return z.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)

        q, k, v = (heads(qkv[:, :, i]) for i in range(3))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
        scores = jnp.where(attn_ok[:, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(cdt)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + ctx @ _deq(p, "wo", cdt) + p["bo"].astype(cdt)
        h = _layer_norm(x, p["ln2_g"], p["ln2_b"], spec.ln_eps).astype(cdt)
        h = _act(h @ _deq(p, "wfc", cdt) + p["bfc"].astype(cdt),
                 spec.activation)
        x = x + h @ _deq(p, "wproj", cdt) + p["bproj"].astype(cdt)
        return x, None

    x, _ = jax.lax.scan(block, x.astype(cdt), params["blocks"])
    x = _layer_norm(x, params["lnf_g"], params["lnf_b"], spec.ln_eps)
    if "wout" in params:
        x = x @ params["wout"].astype(jnp.float32)
    return x @ params["wte"].astype(jnp.float32).T


def engine_sentence_logprobs(params, spec, ids, mask,
                             compute_dtype=jnp.bfloat16):
    """Per-row ``sum_t log P(tok_t | tok_<t)`` over non-pad tokens —
    ``rescore.hf_causal_scorer`` semantics (``jax_lm`` docstring)."""
    logits = engine_forward_logits(params, spec, ids, mask, compute_dtype)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = ids[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask[:, 1:], axis=-1)


# ---------------------------------------------------------------------------
# Synthetic parameters (benchmarking without a 13 GB download/transfer)
# ---------------------------------------------------------------------------


def synth_params(spec: EngineSpec, seed: int = 0, dtype="bfloat16") -> dict:
    """Host-side random engine params (GPT-style 0.02 init) — used by the
    small-scale tests; for 6.7B-class benchmarks prefer
    ``synth_params_on_device`` (no 13 GB host→device transfer)."""
    import ml_dtypes

    np_dtype = np.dtype(
        ml_dtypes.bfloat16 if dtype == "bfloat16" else dtype
    )
    rng = np.random.default_rng(seed)
    params = _alloc_engine_params(spec, np_dtype)

    def fill(a, std=0.02):
        a[...] = (rng.standard_normal(a.shape, np.float32) * std).astype(
            a.dtype
        )

    for k, v in params.items():
        if k == "blocks":
            for name, leaf in v.items():
                if name.startswith("ln") and name.endswith("_g"):
                    leaf[...] = 1.0
                elif name.startswith("ln") or name.startswith("b"):
                    leaf[...] = 0.0
                else:
                    fill(leaf)
        elif k in ("lnf_g",):
            v[...] = 1.0
        elif k in ("lnf_b",):
            v[...] = 0.0
        else:
            fill(v)
    return params


def synth_params_on_device(spec: EngineSpec, seed: int = 0,
                           dtype=jnp.bfloat16, shardings=None,
                           quantize: bool = False) -> dict:
    """Generate the full parameter pytree *on device* (each leaf jitted
    separately so peak HBM ≈ final size — a 6.7B model is built without
    any 13 GB host→device transfer). With ``shardings`` (a matching
    PartitionSpec pytree from ``llm_shardings`` materialized as
    NamedShardings), leaves are created already distributed.
    ``quantize=True`` builds the int8 layout directly (random int8
    weights + constant scales matched to the 0.02 float init) — used by
    the reference-scale benchmark so on-host quantization of a 13 GB
    pytree never happens."""
    template = _synth_shapes(spec, dtype, quantize=quantize)
    leaves_kv, treedef = jax.tree.flatten_with_path(template)
    sh_leaves = (
        jax.tree.flatten(shardings)[0] if shardings is not None
        else [None] * len(leaves_kv)
    )
    out = []
    for i, ((path, leaf), sh) in enumerate(zip(leaves_kv, sh_leaves)):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])

        def make(i=i, name=name, shape=leaf.shape, dt=leaf.dtype):
            # Fused counter-hash generation (ops/hashrng.py): hash-of-iota
            # → Box-Muller, all elementwise, so XLA emits ONE kernel
            # writing only the final-dtype leaf. jax.random.normal would
            # materialize an f32 temporary at 2x the bf16 leaf size —
            # +8.6 GB transient on the 4.3 GB FFN leaf, which busts HBM
            # when synthesizing a 13.3 GB model on a 16 GB chip.
            from ..ops.hashrng import uniform2d

            if name.endswith("_s"):  # int8 scale: σ=0.02 → amax/127
                return jnp.full(shape, 4 * 0.02 / 127.0, dt)
            rows = (
                int(np.prod(shape[:-1], dtype=np.int64))
                if len(shape) > 1 else 1
            )
            cols = shape[-1] if shape else 1
            s = jnp.int32((seed * 0x9E37 + i) & 0x7FFFFFFF)
            if dt == jnp.int8:
                u = uniform2d(s, jnp.int32(0), (rows, cols))
                return (
                    jnp.floor(u * 255.0) - 127.0
                ).astype(jnp.int8).reshape(shape)
            u1 = uniform2d(s, jnp.int32(1), (rows, cols))
            u2 = uniform2d(s, jnp.int32(2), (rows, cols))
            n = jnp.sqrt(-2.0 * jnp.log1p(-u1)) * jnp.cos(
                (2.0 * np.pi) * u2
            )
            return (n * 0.02).astype(dt).reshape(shape)

        fn = jax.jit(make, out_shardings=sh) if sh is not None else jax.jit(
            make
        )
        out.append(fn())
    params = jax.tree.unflatten(treedef, out)
    # norms want gain 1 / bias 0 for a numerically sane forward
    for g in ("ln1_g", "ln2_g"):
        params["blocks"][g] = jnp.ones_like(params["blocks"][g])
    params["lnf_g"] = jnp.ones_like(params["lnf_g"])
    return params


def _synth_shapes(spec: EngineSpec, dtype, quantize: bool = False):
    """Shape/dtype template of the engine pytree (no memory allocated —
    np.empty leaves are never touched, only their .shape is read)."""
    host = _alloc_engine_params(spec, np.float16)
    tpl = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, dtype), host
    )
    if quantize:
        l, d, f = spec.n_layer, spec.d_model, spec.ffn_dim
        b = tpl["blocks"]
        for name in _QUANT_LEAVES:
            w = b.pop(name)
            b[name + "_q"] = jax.ShapeDtypeStruct(w.shape, jnp.int8)
        b["wqkv_s"] = jax.ShapeDtypeStruct((l, 3, 1, d), jnp.float32)
        b["wo_s"] = jax.ShapeDtypeStruct((l, 1, d), jnp.float32)
        b["wfc_s"] = jax.ShapeDtypeStruct((l, 1, f), jnp.float32)
        b["wproj_s"] = jax.ShapeDtypeStruct((l, 1, d), jnp.float32)
    return tpl


# ---------------------------------------------------------------------------
# Tensor-parallel shardings (Megatron-style, GSPMD-compiled)
# ---------------------------------------------------------------------------


def llm_shardings(spec: EngineSpec, mesh, axis: str = "model") -> dict:
    """PartitionSpec pytree for the engine layout over ``mesh[axis]``.

    Head-parallel attention: wqkv's last (output) axis carries whole heads
    per shard (requires ``n_head % mesh.shape[axis] == 0``); wo is
    row-parallel (GSPMD inserts the psum). MLP: wfc column-parallel,
    wproj row-parallel. Embeddings/norms replicated (they are <3% of a
    6.7B model). int8 ``_q/_s`` pairs shard like their float original.
    """
    from jax.sharding import PartitionSpec as P

    n_shard = mesh.shape[axis]
    if spec.n_head % n_shard != 0:
        raise ValueError(
            f"n_head={spec.n_head} not divisible by mesh axis "
            f"'{axis}'={n_shard}; heads would split across shards"
        )
    blocks = {
        "ln1_g": P(), "ln1_b": P(), "ln2_g": P(), "ln2_b": P(),
        "wqkv": P(None, None, None, axis), "bqkv": P(None, None, axis),
        "wo": P(None, axis, None), "bo": P(),
        "wfc": P(None, None, axis), "bfc": P(None, axis),
        "wproj": P(None, axis, None), "bproj": P(),
        # int8 twins (scale layouts: wqkv_s [L,3,1,D]; others [L,1,out])
        "wqkv_q": P(None, None, None, axis), "wqkv_s": P(None, None, None, axis),
        "wo_q": P(None, axis, None), "wo_s": P(),
        "wfc_q": P(None, None, axis), "wfc_s": P(None, None, axis),
        "wproj_q": P(None, axis, None), "wproj_s": P(),
    }
    out = {
        "wte": P(), "wpe": P(), "lnf_g": P(), "lnf_b": P(),
        "blocks": blocks, "win": P(), "wout": P(),
    }
    return out


def _prune_to(params: dict, specs: dict) -> dict:
    """Keep only the sharding entries whose leaves exist in ``params``."""
    pruned = {k: v for k, v in specs.items()
              if k in params and k != "blocks"}
    pruned["blocks"] = {
        k: v for k, v in specs["blocks"].items() if k in params["blocks"]
    }
    return pruned


def shard_params(params: dict, spec: EngineSpec, mesh,
                 axis: str = "model") -> tuple[dict, dict]:
    """``device_put`` the pytree with TP NamedShardings; returns
    ``(sharded_params, named_shardings)`` (the latter reusable as
    ``in_shardings`` for the jitted scorer)."""
    from jax.sharding import NamedSharding

    specs = _prune_to(params, llm_shardings(spec, mesh, axis))
    named = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), params, named
    )
    return sharded, named


# ---------------------------------------------------------------------------
# Scorer (drop-in for rescore.hf_causal_scorer / jax_lm.jax_causal_scorer)
# ---------------------------------------------------------------------------


def engine_scorer(
    model_path: str,
    batch_size: int = 16,
    compute_dtype: str = "bfloat16",
    param_dtype: str = "bfloat16",
    quantize: bool = False,
    mesh=None,
    length_multiple: int = 16,
):
    """Production-scale replacement for ``jax_lm.jax_causal_scorer``:
    streamed bf16 loading (never fp32-materialized), optional int8
    weights, optional TP ``mesh``. Same ``score(sentences)`` contract.
    """
    from transformers import AutoTokenizer

    from .jax_lm import make_batched_scorer

    tok = AutoTokenizer.from_pretrained(model_path)
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token
    params, spec = stream_load_hf(model_path, param_dtype)
    if quantize:
        params = quantize_int8(params)
    if mesh is not None:
        params, _ = shard_params(params, spec, mesh)
    else:
        params = jax.device_put(jax.tree.map(jnp.asarray, params))
    cdt = jnp.dtype(compute_dtype)
    fn = jax.jit(
        lambda p, ids, mask: engine_sentence_logprobs(
            p, spec, ids, mask, compute_dtype=cdt
        )
    )
    return make_batched_scorer(
        tok,
        spec.n_positions,
        lambda ids, mask: fn(params, ids, mask),
        batch_size,
        length_multiple,
    )
