"""Parameter sharding rules: data parallelism + Megatron-style tensor
parallelism over a ('data', 'model') mesh.

The heavy matmuls in this workload are the GRU input projections (layer 0:
``[C·k, 3H·dirs]`` = 8192×6144 at reference scale) and the Conformer FFNs
(1024×2048). TP rules:
  * GRU ``w_ih`` / ``w_hh``: row-parallel — contraction dim sharded over
    'model', activations replicated, XLA inserts the psum;
  * GRU ``fc``: row-parallel on the input (H·dirs) dim;
  * Conformer FFN: classic col-parallel lin1 (+sharded bias) feeding
    row-parallel lin2, with the elementwise SiLU on the sharded axis —
    one psum per FFN;
  * everything else (day affine, norms, small projections) replicated.

All collectives are derived by XLA GSPMD from these NamedSharding
annotations; there is no hand-written communication (scaling-book recipe:
pick a mesh, annotate, let XLA insert collectives).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def gru_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding pytree for GRU params (see init_gru_params layout)."""
    rep = _ns(mesh)
    out = jax.tree.map(lambda _: rep, params)
    for i, layer in enumerate(params["gru"]["layers"]):
        del layer
        out["gru"]["layers"][i]["w_ih"] = _ns(mesh, None, "model", None)
        out["gru"]["layers"][i]["w_hh"] = _ns(mesh, None, "model", None)
    out["fc"]["weight"] = _ns(mesh, "model", None)
    return out


def interleave_attention_params(params: Any, num_heads: int) -> Any:
    """Permute in_proj columns from torch's ({q,k,v}, head, dh) order to
    the per-head-interleaved (head, {q,k,v}, dh) order that
    ``ConformerConfig.qkv_interleaved`` forwards expect.

    A pure column permutation of the qkv projection — single-device
    logits are bit-identical — but it makes head-parallel MHSA TP a plain
    last-axis sharding: each 'model' shard's local columns are exactly its
    heads' q/k/v, so attention runs collective-free up to the row-parallel
    out projection. Involution-adjoint: ``deinterleave_attention_params``
    restores torch order (checkpoint export / parity tooling).
    """
    import jax.numpy as jnp

    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    for blk in out["blocks"]:
        w = blk["attn"]["in_proj_w"]
        b = blk["attn"]["in_proj_b"]
        d = w.shape[0]
        dh = d // num_heads
        blk["attn"]["in_proj_w"] = (
            w.reshape(d, 3, num_heads, dh)
            .transpose(0, 2, 1, 3)
            .reshape(d, 3 * d)
        )
        blk["attn"]["in_proj_b"] = jnp.asarray(b).reshape(
            3, num_heads, dh
        ).transpose(1, 0, 2).reshape(3 * d)
    return out


def deinterleave_attention_params(params: Any, num_heads: int) -> Any:
    """Inverse of ``interleave_attention_params`` (back to torch order)."""
    import jax.numpy as jnp

    out = jax.tree.map(lambda x: x, params)
    for blk in out["blocks"]:
        w = blk["attn"]["in_proj_w"]
        b = blk["attn"]["in_proj_b"]
        d = w.shape[0]
        dh = d // num_heads
        blk["attn"]["in_proj_w"] = (
            w.reshape(d, num_heads, 3, dh)
            .transpose(0, 2, 1, 3)
            .reshape(d, 3 * d)
        )
        blk["attn"]["in_proj_b"] = jnp.asarray(b).reshape(
            num_heads, 3, dh
        ).transpose(1, 0, 2).reshape(3 * d)
    return out


def conformer_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding pytree for Conformer params: FFN column/row parallelism +
    head-parallel MHSA (requires the interleaved qkv layout — the qkv
    in_proj is column-parallel with whole heads per shard, the out
    projection row-parallel; XLA inserts one psum per attention)."""
    rep = _ns(mesh)
    out = jax.tree.map(lambda _: rep, params)
    for i in range(len(params["blocks"])):
        for ff in ("ff1", "ff2"):
            out["blocks"][i][ff]["lin1"]["w"] = _ns(mesh, None, "model")
            out["blocks"][i][ff]["lin1"]["b"] = _ns(mesh, "model")
            out["blocks"][i][ff]["lin2"]["w"] = _ns(mesh, "model", None)
        attn = out["blocks"][i]["attn"]
        attn["in_proj_w"] = _ns(mesh, None, "model")
        attn["in_proj_b"] = _ns(mesh, "model")
        attn["out"]["w"] = _ns(mesh, "model", None)
    return out


def shard_params(params: Any, mesh: Mesh, model_type: str,
                 num_heads: int | None = None) -> Any:
    """Device-put params with the TP rules for the given model family.

    For the Conformer, ``num_heads`` triggers the qkv relayout that the
    head-parallel attention sharding (and the model's ``qkv_interleaved``
    forward) require; the trainer passes it whenever TP is on.
    """
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        sh = jax.tree.map(lambda _: _ns(mesh), params)
    elif model_type == "transformer_ctc":
        if num_heads is not None:
            if mesh.shape["model"] > 1 and num_heads % mesh.shape["model"]:
                raise ValueError(
                    f"num_heads={num_heads} not divisible by the 'model' "
                    f"mesh axis ({mesh.shape['model']}); heads would "
                    f"split across shards"
                )
            params = interleave_attention_params(params, num_heads)
        sh = conformer_param_shardings(params, mesh)
    else:
        sh = gru_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)
