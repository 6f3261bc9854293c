"""Ambient kernel-mesh registry: keeps Pallas fast paths alive multi-chip.

Mosaic custom calls have no GSPMD partitioning rule, so a Pallas kernel
placed directly under a multi-device ``jit`` makes XLA all-gather its
operands and run the kernel replicated on every chip — correct, but it
serializes exactly the ops the kernels exist to speed up. The fix is
``jax.shard_map``: inside a manual region each device runs the kernel on
its local shard, and the surrounding GSPMD program never sees the custom
call (scaling-book recipe for custom kernels; ROADMAP "Scale-out").

The model code sits several layers below the trainer that owns the
``jax.sharding.Mesh``, and threading a mesh through every frozen model
config would leak parallelism into model semantics. Instead the trainer
registers its mesh here (``set_kernel_mesh``), and the kernel call sites
(``models/gru.py``, ``models/conformer.py``, ``ops/ctc.py``) consult
``get_kernel_mesh()`` at trace time:

  * single device → plain kernel call (registry ignored);
  * multi-device with a registered mesh and shard-divisible shapes →
    the call is wrapped in ``shard_map`` with the batch axis mapped
    (plus the model axis for head-parallel attention);
  * multi-device with no registered mesh → the auto-gates fall back to
    the XLA twin paths, as before.

Gradient correctness of the wrapping (validated on the 8-device CPU mesh,
tests/test_kernel_shardmap.py): weights enter with unmapped specs
(``P()``), and shard_map's transpose psums their cotangents over the
manual axes. The regions are FULLY manual with ``check_vma=False`` —
JAX 0.9's partial-manual mode demands vma metadata on every
``ShapeDtypeStruct`` a ``pallas_call`` emits, which the kernels don't
carry — and under full-manual the unmapped-weight transpose psums over
*every* mesh axis. That sum is only correct when compute is not
replicated along any axis, so the wrap is gated to meshes whose mapped
axes cover ALL devices: batch-only meshes for the GRU scan / CTC /
frontend kernels (``kernel_batch_shards``), batch×model for
head-parallel attention (heads mapped over 'model'). Tensor-parallel
meshes with replicated-kernel operands fall back to the XLA twins.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

from jax.sharding import Mesh


@dataclass(frozen=True)
class KernelMesh:
    """A registered mesh + the axis names kernels shard over."""

    mesh: Mesh
    batch_axis: str = "data"
    model_axis: str = "model"

    @property
    def batch_shards(self) -> int:
        return int(self.mesh.shape.get(self.batch_axis, 1))

    @property
    def model_shards(self) -> int:
        return int(self.mesh.shape.get(self.model_axis, 1))

    @property
    def n_devices(self) -> int:
        return int(self.mesh.devices.size)


_current: KernelMesh | None = None


def set_kernel_mesh(
    mesh: Mesh | None,
    *,
    batch_axis: str = "data",
    model_axis: str = "model",
) -> KernelMesh | None:
    """Register ``mesh`` as the ambient kernel mesh; returns the previous
    registration (pass it back to restore)."""
    global _current
    prev = _current
    _current = (
        None
        if mesh is None
        else KernelMesh(mesh, batch_axis=batch_axis, model_axis=model_axis)
    )
    return prev


def clear_kernel_mesh() -> None:
    global _current
    _current = None


def restore_kernel_mesh(prev: KernelMesh | None) -> None:
    """Reinstate a registration previously returned by ``set_kernel_mesh``
    / ``get_kernel_mesh`` (so scoped users can nest without clobbering an
    outer caller's mesh)."""
    global _current
    _current = prev


def batch_mappable_mesh(batch: int, *, tile: int = 1) -> KernelMesh | None:
    """The registered mesh if a batch-mapped kernel can shard_map over it,
    else None.

    This is the single gating predicate for the multi-device kernel
    wrappers (models/gru.py, models/conformer.py, ops/ctc.py): the mesh's
    batch axis must cover ALL devices (fully-manual shard_map — see module
    docstring) and ``batch`` must split into per-shard multiples of
    ``tile``. Callers that get None on a multi-device run fall back to
    their XLA twin; single-device callers shouldn't reach here."""
    km = get_kernel_mesh()
    if km is None or km.n_devices <= 1 or km.batch_shards != km.n_devices:
        return None
    s = km.batch_shards
    if batch % s != 0 or (batch // s) == 0 or (batch // s) % tile != 0:
        return None
    return km


def get_kernel_mesh() -> KernelMesh | None:
    return _current


def batch_shard_mapped(
    fn,
    *args,
    batch_dims: tuple,
    out_batch_dims,
    tile: int = 1,
    fold_rng_arg: int | None = None,
):
    """Run ``fn(*args)`` on the batch-sharded kernel path, or return None.

    The shared body of the multi-device Pallas kernel wrappers
    (``models/gru.py``, ``models/conformer.py``, ``ops/ctc.py``):

      * single device → plain ``fn(*args)``; ``tile`` is NOT checked here
        — the caller's own single-device shape gates (e.g. ``ctc_loss``'s
        ``B % 8`` warning, ``_pallas_scan_gate``) remain responsible;
      * multi-device with a registered mesh whose batch axis covers ALL
        devices and splits the batch into per-shard multiples of ``tile``
        (the kernel's own batch tiling requirement — it applies to the
        SHARD-LOCAL batch each device sees, so on multi-device meshes a
        forced kernel flag can't smuggle mis-tiled per-shard shapes past
        the gate) → ``fn`` inside a
        fully-manual ``shard_map`` with ``check_vma=False`` (JAX 0.9
        partial-manual needs vma metadata Pallas out-shapes don't carry;
        full coverage of the mesh keeps the unmapped-operand transpose
        psum correct — module docstring);
      * otherwise → None; the caller falls back to its XLA twin (a bare
        Mosaic custom call has no GSPMD partitioning rule, so running it
        under the multi-device jit would all-gather + replicate).

    ``batch_dims`` gives, per positional arg, the index of its batch axis
    (None = replicated, spec ``P()``); ``out_batch_dims`` the same for the
    output (an int, or a tuple for multiple outputs). The global batch is
    read off the first mapped arg. ``fold_rng_arg`` names an arg holding a
    PRNG key to ``fold_in`` with the shard index inside the manual region,
    decorrelating in-kernel dropout streams whose program-id counter
    restarts at 0 on every shard.
    """
    import jax

    if jax.device_count() <= 1:
        return fn(*args)
    first = next(i for i, d in enumerate(batch_dims) if d is not None)
    batch = args[first].shape[batch_dims[first]]
    km = batch_mappable_mesh(batch, tile=tile)
    if km is None:
        return None

    from jax.sharding import PartitionSpec as P

    def spec(d):
        return P() if d is None else P(*([None] * d + [km.batch_axis]))

    in_specs = tuple(spec(d) for d in batch_dims)
    out_specs = (
        spec(out_batch_dims)
        if isinstance(out_batch_dims, int)
        else tuple(spec(d) for d in out_batch_dims)
    )
    inner = fn
    if fold_rng_arg is not None:

        def inner(*a):
            a = list(a)
            a[fold_rng_arg] = jax.random.fold_in(
                a[fold_rng_arg], jax.lax.axis_index(km.batch_axis)
            )
            return fn(*a)

    return jax.shard_map(
        inner,
        mesh=km.mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(*args)


@contextmanager
def kernel_mesh(mesh: Mesh | None, **kwargs):
    """Scoped registration (tests / library callers)."""
    prev = set_kernel_mesh(mesh, **kwargs)
    try:
        yield
    finally:
        restore_kernel_mesh(prev)


def kernel_batch_shards(
    batch: int, *, tile: int = 1, n_devices: int | None = None
) -> int | None:
    """How many ways a kernel call may shard ``batch``, or None if the
    kernel path is unavailable on this device count.

    Returns 1 on a single device (no wrap needed; the caller's own shape
    gate applies). Multi-device: the registered mesh's batch-axis size,
    provided the batch axis covers ALL mesh devices (fully-manual
    shard_map requirement — see module docstring) and each shard's batch
    is a positive multiple of ``tile``; None when no mesh is registered,
    the mesh has a non-trivial second axis, or the batch doesn't split
    cleanly (callers fall back to the XLA twin).
    """
    if n_devices is None:
        import jax

        n_devices = jax.device_count()
    if n_devices <= 1:
        return 1
    km = batch_mappable_mesh(batch, tile=tile)
    return None if km is None else km.batch_shards
