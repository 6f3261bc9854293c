"""TPU-native causal-LM rescoring: run the n-best LLM pass as pure JAX.

The reference rescores its n-best lists with OPT-6.7B loaded through
torch + bitsandbytes on a GPU (``eval_competition.py:84-86,125-137``).
Here the same pass is a jitted, batched, static-shaped JAX forward on the
TPU: a local HuggingFace GPT-2- or OPT-family checkpoint is converted once
into a plain pytree (torch is used only to *read* the weights), the
transformer stack runs as a ``lax.scan`` over stacked layer parameters
(one compiled layer body regardless of depth), and sentences are scored in
fixed-shape buckets so each (batch, length) bucket compiles exactly once.

Matmuls run in bf16 on TPU (fp32 available for parity tests); softmax,
layer norms and the final log-softmax stay fp32. Scoring semantics match
``rescore.hf_causal_scorer`` exactly: per-sentence
``sum_t log P(tok_t | tok_<t)`` with no extra BOS beyond what the
checkpoint's tokenizer inserts — the two scorers are interchangeable
behind ``rescore_nbest`` (parity pinned in ``tests/test_jax_lm.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LMSpec", "load_causal_lm", "sentence_logprobs", "jax_causal_scorer"]


@dataclass(frozen=True)
class LMSpec:
    """Architecture knobs shared by the GPT-2 and OPT decoder families."""

    n_head: int
    n_positions: int
    activation: str  # "gelu_new" (GPT-2) | "relu" / "gelu" (OPT)
    pos_offset: int  # OPT's learned positions start at index 2
    ln_eps: float


def _from_torch(t):
    return np.asarray(t.detach().cpu().to(__import__("torch").float32))


def _gpt2_params(sd, cfg):
    """GPT-2: Conv1D weights are stored [in, out] — used as ``x @ W`` as-is."""
    blocks = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}."
        blocks.append(
            {
                "ln1_g": _from_torch(sd[p + "ln_1.weight"]),
                "ln1_b": _from_torch(sd[p + "ln_1.bias"]),
                "wqkv": _from_torch(sd[p + "attn.c_attn.weight"]),
                "bqkv": _from_torch(sd[p + "attn.c_attn.bias"]),
                "wo": _from_torch(sd[p + "attn.c_proj.weight"]),
                "bo": _from_torch(sd[p + "attn.c_proj.bias"]),
                "ln2_g": _from_torch(sd[p + "ln_2.weight"]),
                "ln2_b": _from_torch(sd[p + "ln_2.bias"]),
                "wfc": _from_torch(sd[p + "mlp.c_fc.weight"]),
                "bfc": _from_torch(sd[p + "mlp.c_fc.bias"]),
                "wproj": _from_torch(sd[p + "mlp.c_proj.weight"]),
                "bproj": _from_torch(sd[p + "mlp.c_proj.bias"]),
            }
        )
    return {
        "wte": _from_torch(sd["transformer.wte.weight"]),
        "wpe": _from_torch(sd["transformer.wpe.weight"]),
        "blocks": blocks,
        "lnf_g": _from_torch(sd["transformer.ln_f.weight"]),
        "lnf_b": _from_torch(sd["transformer.ln_f.bias"]),
    }


def _opt_params(sd, cfg):
    """OPT: nn.Linear weights are [out, in] — transposed once here so the
    forward is a uniform ``x @ W`` for both families. The separate q/k/v
    projections are packed into one [D, 3D] matmul (same layout as GPT-2's
    fused c_attn) so the hot path is a single MXU-friendly GEMM."""
    if not cfg.do_layer_norm_before:
        raise NotImplementedError("OPT variants with post-LN are not supported")
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.decoder.layers.{i}."
        wq = _from_torch(sd[p + "self_attn.q_proj.weight"]).T
        wk = _from_torch(sd[p + "self_attn.k_proj.weight"]).T
        wv = _from_torch(sd[p + "self_attn.v_proj.weight"]).T
        bq = _from_torch(sd[p + "self_attn.q_proj.bias"])
        bk = _from_torch(sd[p + "self_attn.k_proj.bias"])
        bv = _from_torch(sd[p + "self_attn.v_proj.bias"])
        blocks.append(
            {
                "ln1_g": _from_torch(sd[p + "self_attn_layer_norm.weight"]),
                "ln1_b": _from_torch(sd[p + "self_attn_layer_norm.bias"]),
                "wqkv": np.concatenate([wq, wk, wv], axis=1),
                "bqkv": np.concatenate([bq, bk, bv]),
                "wo": _from_torch(sd[p + "self_attn.out_proj.weight"]).T,
                "bo": _from_torch(sd[p + "self_attn.out_proj.bias"]),
                "ln2_g": _from_torch(sd[p + "final_layer_norm.weight"]),
                "ln2_b": _from_torch(sd[p + "final_layer_norm.bias"]),
                "wfc": _from_torch(sd[p + "fc1.weight"]).T,
                "bfc": _from_torch(sd[p + "fc1.bias"]),
                "wproj": _from_torch(sd[p + "fc2.weight"]).T,
                "bproj": _from_torch(sd[p + "fc2.bias"]),
            }
        )
    out = {
        "wte": _from_torch(sd["model.decoder.embed_tokens.weight"]),
        "wpe": _from_torch(sd["model.decoder.embed_positions.weight"]),
        "blocks": blocks,
        "lnf_g": _from_torch(sd["model.decoder.final_layer_norm.weight"]),
        "lnf_b": _from_torch(sd["model.decoder.final_layer_norm.bias"]),
    }
    # OPT-350m-style word/hidden dim split: project_in after the embedding,
    # project_out before the tied LM head (both bias-free Linears).
    if cfg.word_embed_proj_dim != cfg.hidden_size:
        out["win"] = _from_torch(sd["model.decoder.project_in.weight"]).T
        out["wout"] = _from_torch(sd["model.decoder.project_out.weight"]).T
    return out


def load_causal_lm(model_path: str):
    """Read a local HF checkpoint (GPT-2 or OPT family) into a JAX pytree.

    Returns ``(params, spec, tokenizer)``. torch only reads the weights;
    all compute is JAX. Layer blocks are stacked along a leading layer axis
    so the forward can ``lax.scan`` over them.
    """
    from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

    cfg = AutoConfig.from_pretrained(model_path)
    tok = AutoTokenizer.from_pretrained(model_path)
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token
    model = AutoModelForCausalLM.from_pretrained(model_path)
    sd = model.state_dict()
    if cfg.model_type == "gpt2":
        raw = _gpt2_params(sd, cfg)
        spec = LMSpec(
            n_head=cfg.n_head,
            n_positions=cfg.n_positions,
            activation=cfg.activation_function,
            pos_offset=0,
            ln_eps=cfg.layer_norm_epsilon,
        )
    elif cfg.model_type == "opt":
        raw = _opt_params(sd, cfg)
        spec = LMSpec(
            n_head=cfg.num_attention_heads,
            n_positions=cfg.max_position_embeddings,
            activation=cfg.activation_function,
            pos_offset=2,  # OPTLearnedPositionalEmbedding offset
            ln_eps=1e-5,
        )
    else:
        raise NotImplementedError(
            f"unsupported model_type {cfg.model_type!r} (gpt2/opt)"
        )
    del model, sd
    blocks = jax.tree.map(
        lambda *xs: np.stack(xs), *raw.pop("blocks")
    )  # each leaf: [L, ...]
    params = {**raw, "blocks": blocks}
    return params, spec, tok


def _layer_norm(x, g, b, eps):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _act(x, name):
    if name == "gelu_new":
        return jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu(x)
    raise NotImplementedError(name)


def _forward_logits(params, spec: LMSpec, ids, mask, compute_dtype):
    """[B, T] ids/mask -> [B, T, V] fp32 logits. Causal + padding mask."""
    b, t = ids.shape
    wte = params["wte"].astype(compute_dtype)
    x = wte[ids]
    if "win" in params:  # OPT word/hidden dim split (project_in)
        x = x @ params["win"].astype(compute_dtype)
    x = x + params["wpe"][spec.pos_offset : spec.pos_offset + t].astype(
        compute_dtype
    )
    n_head = spec.n_head
    d = x.shape[-1]
    dh = d // n_head
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    attn_ok = causal[None, :, :] & (mask > 0)[:, None, :]  # [B, Tq, Tk]

    def block(x, p):
        h = _layer_norm(x, p["ln1_g"], p["ln1_b"], spec.ln_eps).astype(
            compute_dtype
        )
        qkv = h @ p["wqkv"].astype(compute_dtype) + p["bqkv"].astype(
            compute_dtype
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
        scores = jnp.where(attn_ok[:, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + ctx @ p["wo"].astype(compute_dtype) + p["bo"].astype(
            compute_dtype
        )
        h = _layer_norm(x, p["ln2_g"], p["ln2_b"], spec.ln_eps).astype(
            compute_dtype
        )
        h = _act(
            h @ p["wfc"].astype(compute_dtype) + p["bfc"].astype(compute_dtype),
            spec.activation,
        )
        x = x + h @ p["wproj"].astype(compute_dtype) + p["bproj"].astype(
            compute_dtype
        )
        return x, None

    x, _ = jax.lax.scan(block, x.astype(compute_dtype), params["blocks"])
    x = _layer_norm(x, params["lnf_g"], params["lnf_b"], spec.ln_eps)
    if "wout" in params:  # project_out back to the word-embedding dim
        x = x @ params["wout"].astype(jnp.float32)
    # tied LM head in fp32 (logits feed a log-softmax; bf16 here costs PER)
    return x @ params["wte"].astype(jnp.float32).T


def sentence_logprobs(params, spec: LMSpec, ids, mask, compute_dtype=jnp.float32):
    """Per-row ``sum_t log P(tok_t | tok_<t)`` over valid (non-pad) tokens."""
    logits = _forward_logits(params, spec, ids, mask, compute_dtype)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = ids[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask[:, 1:], axis=-1)


def make_batched_scorer(
    tok,
    n_positions: int,
    score_batch,
    batch_size: int = 16,
    length_multiple: int = 16,
):
    """Shared host loop for sentence scorers: tokenize, pad into static
    ``(batch_size, T_bucket)`` shapes (``T`` rounded up to
    ``length_multiple``), truncate-with-warning past the position table,
    call ``score_batch(ids, mask) -> [batch_size] logprobs``.

    Used by both ``jax_causal_scorer`` (small checkpoints) and
    ``llm_engine.engine_scorer`` (reference scale) — one copy of the
    bucketing/truncation semantics. ``score_batch`` is typically a jitted
    function; jit caches per input shape, so each bucket compiles once.
    """

    def score(sentences: Sequence[str]) -> list[float]:
        out: list[float] = []
        for i in range(0, len(sentences), batch_size):
            chunk = [s if s else " " for s in sentences[i : i + batch_size]]
            enc = tok(chunk, padding=True)
            ids = np.asarray(enc["input_ids"], np.int32)
            mask = np.asarray(enc["attention_mask"], np.int32)
            t = ids.shape[1]
            t_pad = min(
                -(-max(t, 2) // length_multiple) * length_multiple,
                n_positions,
            )
            if t > t_pad:  # sentence longer than the position table
                # The torch hf_causal_scorer (pinned as interchangeable)
                # would fail loudly here; truncating silently would return
                # prefix-only logprobs. Warn so the divergence is visible.
                import warnings

                warnings.warn(
                    f"sentence batch length {t} exceeds the checkpoint's "
                    f"position table ({n_positions}); scoring only "
                    f"the first {t_pad} tokens of over-long sentences",
                    stacklevel=2,
                )
                ids, mask = ids[:, :t_pad], mask[:, :t_pad]
            n = ids.shape[0]
            ids = np.pad(ids, ((0, batch_size - n), (0, t_pad - ids.shape[1])))
            mask = np.pad(
                mask, ((0, batch_size - n), (0, t_pad - mask.shape[1]))
            )
            out.extend(np.asarray(score_batch(ids, mask))[:n].tolist())
        return out

    return score


def jax_causal_scorer(
    model_path: str,
    batch_size: int = 16,
    compute_dtype: str = "bfloat16",
    length_multiple: int = 16,
):
    """Drop-in replacement for ``rescore.hf_causal_scorer`` running on the
    JAX default device (the TPU in production). Sentences are tokenized on
    host, padded into static ``(batch_size, T_bucket)`` shapes (``T`` rounded
    up to ``length_multiple``), and scored by a jitted forward — one compile
    per length bucket, reused across the whole n-best sweep.

    Length limit: sentences longer than the checkpoint's position table
    (``spec.n_positions``) are truncated to it, with a warning — the
    returned logprob then covers only that prefix.
    """
    params, spec, tok = load_causal_lm(model_path)
    params = jax.device_put(jax.tree.map(jnp.asarray, params))
    cdtype = jnp.dtype(compute_dtype)
    fn = jax.jit(
        lambda p, ids, mask: sentence_logprobs(
            p, spec, ids, mask, compute_dtype=cdtype
        )
    )
    return make_batched_scorer(
        tok,
        spec.n_positions,
        lambda ids, mask: fn(params, ids, mask),
        batch_size,
        length_multiple,
    )
