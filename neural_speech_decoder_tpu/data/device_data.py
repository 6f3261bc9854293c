"""Device-resident dataset: stage features on-device once, assemble batches there.

The reference transfers a freshly padded batch host→GPU every step
(``neural_decoder_trainer.py:184-191`` — ~84 MB at the baseline recipe).
On a TPU host that PCIe copy is cheap but still the largest per-step host
cost; through a remote-tunnel device it dominates the step outright. The
TPU-first alternative: put the packed ``[ΣT, C]`` feature array in HBM
once, sample trial *indices* on the host (identical RNG stream and batch
composition to the host path — resume/parity is bit-exact), and gather +
pad the ``[B, T_env, C]`` batch on-device inside a tiny jitted assembler.
Per-step h2d traffic drops from O(B·T·C) to O(B) scalars.

Enabled by ``deviceResidentData: true`` in the trainer args. The gather is
a contiguous-row gather (1 KB rows from HBM), not a scalar gather, so it
runs at memory bandwidth on the MXU-adjacent path; padding parity with the
host ``_gather`` (zero rows past ``x_lens``) is exact and tested
(``tests/test_device_data.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import PackedDataset


@partial(jax.jit, static_argnames=("t_env",))
def _assemble_x(features, offs, x_lens, *, t_env: int):
    """Gather + zero-pad one batch of trials from packed features.

    features: [ΣT, C] (device-resident), offs: [B] int32 trial start rows,
    x_lens: [B] int32 valid lengths (already clamped to t_env).
    Returns [B, t_env, C] float32 matching the host ``_gather`` bit-exactly.
    """
    t_idx = jnp.arange(t_env, dtype=jnp.int32)
    valid = t_idx[None, :] < x_lens[:, None]
    # NOTE: jnp.take's TPU default fills out-of-bounds with NaN (not clamp);
    # rows are forced in-bounds via the mask before the gather.
    rows = jnp.where(valid, offs[:, None] + t_idx[None, :], 0)
    x = jnp.take(features, rows, axis=0, mode="clip")
    return jnp.where(valid[..., None], x, jnp.float32(0))


class DeviceData:
    """Staged features for one PackedDataset + its batch assembler."""

    def __init__(self, ds: PackedDataset, sharding=None):
        if ds.offsets[-1] >= np.iinfo(np.int32).max:
            raise ValueError(
                "deviceResidentData needs ΣT < 2^31 rows; split the dataset"
            )
        self.offsets = ds.offsets.astype(np.int32)
        self.features = (
            jax.device_put(ds.features, sharding)
            if sharding is not None
            else jax.device_put(ds.features)
        )

    def assemble(self, batch, *, batch_sharding=None):
        """Device (x, y, x_lens, y_lens, days) for a Batch carrying idx.

        Only ``x`` is assembled on-device; the label-side arrays are tiny
        (O(B·U) int32) and transfer directly.
        """
        offs = self.offsets[batch.idx]
        put = (
            (lambda a: jax.device_put(a, batch_sharding))
            if batch_sharding is not None
            else jax.device_put
        )
        x_lens = put(batch.x_lens)
        x = _assemble_x(self.features, put(offs), x_lens, t_env=batch.t_env)
        return (x, put(batch.y), x_lens, put(batch.y_lens), put(batch.days))
