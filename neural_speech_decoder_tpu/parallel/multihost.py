"""Multi-host initialization and mesh construction.

One JAX process per host, collectives over ICI within a slice and DCN
across slices (SURVEY.md §5 distributed-communication plan). The single-
host paths in this repo need none of this; these helpers are the entry
point when launching across TPU slices.

Usage (one process per host, same program everywhere):

    from neural_speech_decoder_tpu.parallel.multihost import (
        initialize, make_global_mesh)
    initialize()                        # env-driven on Cloud TPU
    mesh = make_global_mesh(n_model=1)  # ('data','model') over ALL chips
    # train_model consumes global batches via jax.make_array_from_process_
    # local_data under this mesh; gradient all-reduce spans hosts via GSPMD.
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with env-based defaults (Cloud TPU VMs
    auto-discover; explicit args for other clusters)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_global_mesh(n_model: int = 1):
    """('data', 'model') mesh over every chip in the job. The model axis
    should stay within a host/slice so TP collectives ride ICI, which
    jax.devices() ordering (hosts-major) provides for n_model <= chips/host."""
    return make_mesh(n_model=n_model, devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_rows(n_rows: int) -> slice:
    """This process's row slice of a [n_rows, ...] global batch.

    All processes sample the identical global batch (same seeded RNG
    sequence — keeps single-process bit-parity and exact resume), then each
    keeps its contiguous shard. Requires n_rows % process_count == 0.
    """
    n_proc = jax.process_count()
    if n_rows % n_proc:
        raise ValueError(
            f"global batch {n_rows} must divide across {n_proc} processes"
        )
    per = n_rows // n_proc
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def stage_local_batch(sharding, arrays: tuple) -> tuple:
    """Assemble global device arrays from process-local batch shards.

    ``arrays`` are this process's rows of the global batch (first axis);
    ``sharding`` is the global batch sharding (first axis over 'data').
    Under one process this reduces to a sharded device_put; under many it
    stitches the global array without gathering data to any single host
    (jax.make_array_from_process_local_data; SURVEY.md §5 distributed plan).
    """
    import numpy as np

    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in arrays
    )
