"""Ahead-of-time inference export via ``jax.export`` (StableHLO).

The reference deploys by unpickling ``args`` + a torch state dict back
into the full training codebase (``neural_decoder_trainer.py:390-410``),
so serving a model drags the whole framework (and torch) along. Here the
jitted eval forward is exported once as a serialized StableHLO artifact:
a serving process needs only jax + the artifact — no model code, no
checkpoint machinery — and the function is version-stable under
``jax.export``'s compatibility guarantees.

Artifact layout (``<out_dir>/``):

- ``model.shlo`` — the serialized exported function
  ``(weights, x, days, x_lens) -> (log_probs [B,T',K], out_lens [B])``
  where ``weights`` is a flat tuple of parameter arrays;
- ``weights.npz`` — the parameter leaves ``w000…`` in flatten order
  (bfloat16 leaves stored as float32, true dtype recorded in meta);
- ``meta.json`` — model family, input shapes/dtypes, lowering
  platform(s), jax version.

Platform note: the kernel auto-gates (``models/gru.py``,
``models/conformer.py``) pick Pallas-vs-XLA-twin paths at TRACE time
from ``jax.default_backend()``, so export on the platform you will serve
on: a TPU-host export embeds the Pallas fast paths (Mosaic custom calls
— a TPU-only artifact), a CPU export embeds the portable XLA twins.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

_BLOB = "model.shlo"
_WEIGHTS = "weights.npz"
_META = "meta.json"


def export_inference(
    model_dir: str,
    out_dir: str,
    *,
    batch_size: int | None = None,
    t_max: int | None = None,
) -> str:
    """Export the eval forward of a trained run directory as an AOT
    artifact. Shapes are static (XLA): one artifact serves one padded
    ``(batch_size, t_max)`` envelope — export several for several
    envelopes. Defaults come from the run's ``args`` (``batchSize``;
    ``maxTimeSeriesLen`` rounded up to ``time_multiple``).
    """
    from ..training.trainer import load_model

    params, model, args = load_model(model_dir)
    b = int(batch_size or args.get("batchSize", 8))
    tm = int(args.get("time_multiple", 1) or 1)
    t = int(t_max or args.get("maxTimeSeriesLen", 1200))
    t = ((t + tm - 1) // tm) * tm
    n_ch = int(args["nInputFeatures"])

    leaves, treedef = jax.tree.flatten(params)

    def infer(weights, x, days, x_lens):
        p = jax.tree.unflatten(treedef, list(weights))
        log_probs, out_lens, _ = model.forward(
            p, x, days, x_lens, train=False, key=None
        )
        return log_probs, out_lens

    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    exported = jax_export.export(jax.jit(infer))(
        tuple(sds(leaf) for leaf in leaves),
        jax.ShapeDtypeStruct((b, t, n_ch), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BLOB), "wb") as f:
        f.write(exported.serialize())

    arrs, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dtypes.append(str(a.dtype))
        if a.dtype == jnp.bfloat16:  # npz has no native bf16 encoding
            a = a.astype(np.float32)
        arrs[f"w{i:03d}"] = a
    np.savez(os.path.join(out_dir, _WEIGHTS), **arrs)

    meta = {
        "model_type": model.name,
        "batch_size": b,
        "t_max": t,
        "n_channels": n_ch,
        "n_leaves": len(leaves),
        "leaf_dtypes": dtypes,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "outputs": "log_probs [B, T', K] (log-softmax), out_lens [B]",
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


class ExportedModel:
    """A loaded AOT artifact: ``model(x, days, x_lens)`` with weights
    bound from ``weights.npz``. Needs only jax — no model code."""

    def __init__(self, art_dir: str):
        with open(os.path.join(art_dir, _META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(art_dir, _BLOB), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        npz = np.load(os.path.join(art_dir, _WEIGHTS))
        leaves = []
        for i, dt in enumerate(self.meta["leaf_dtypes"]):
            a = npz[f"w{i:03d}"]
            if dt == "bfloat16":
                a = a.astype(jnp.bfloat16)
            leaves.append(a)
        self._weights = tuple(leaves)
        # jit over Exported.call caches the executable across invocations
        self._call = jax.jit(self._exported.call)

    def __call__(self, x, days, x_lens):
        """``x [B,T,C] f32``, ``days [B] i32``, ``x_lens [B] i32`` →
        ``(log_probs [B,T',K], out_lens [B])``. Shapes must match the
        exported envelope exactly (meta['batch_size'], meta['t_max'])."""
        return self._call(self._weights, x, days, x_lens)


def load_exported(art_dir: str) -> ExportedModel:
    return ExportedModel(art_dir)
