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


def conformer_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding pytree for Conformer params (FFN tensor parallelism)."""
    rep = _ns(mesh)
    out = jax.tree.map(lambda _: rep, params)
    for i in range(len(params["blocks"])):
        for ff in ("ff1", "ff2"):
            out["blocks"][i][ff]["lin1"]["w"] = _ns(mesh, None, "model")
            out["blocks"][i][ff]["lin1"]["b"] = _ns(mesh, "model")
            out["blocks"][i][ff]["lin2"]["w"] = _ns(mesh, "model", None)
    return out


def shard_params(params: Any, mesh: Mesh, model_type: str) -> Any:
    """Device-put params with the TP rules for the given model family."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        sh = jax.tree.map(lambda _: _ns(mesh), params)
    elif model_type == "transformer_ctc":
        sh = conformer_param_shardings(params, mesh)
    else:
        sh = gru_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)
