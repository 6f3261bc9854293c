"""Device-mesh construction and sharding helpers.

The reference is strictly single-GPU (``device = "cuda"``,
``neural_decoder_trainer.py:65``; no torch.distributed anywhere — SURVEY.md
§2.3). Scaling here is TPU-native: a ``jax.sharding.Mesh`` over ICI with a
``data`` axis (batch sharding — the primary strategy at this model scale)
and an optional ``model`` axis for tensor-parallel sharding of the large
GRU input projection / Conformer FFN matmuls. Gradient all-reduce and TP
collectives are inserted by XLA from sharding annotations; no hand-written
communication is needed for parity.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, *, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.array(used).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put every array in a pytree with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
