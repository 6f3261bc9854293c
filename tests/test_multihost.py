"""Multi-host staging: 2-process CPU jax.distributed run vs single-process.

Exercises parallel/multihost.py end to end: `initialize` (explicit
coordinator), `make_global_mesh` over both processes' devices,
`local_rows` + `stage_local_batch` (make_array_from_process_local_data),
and a jitted sharded train step whose gradient all-reduce spans the two
processes (Gloo CPU collectives). The loss must bit-match the
single-process run of the identical batch — the same guarantee
test_multichip.py pins for single-process DP.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

WORKER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {root!r})
from neural_speech_decoder_tpu.parallel.multihost import (
    initialize, make_global_mesh, local_rows, stage_local_batch, is_primary)
initialize(coordinator_address="localhost:" + port,
           num_processes=2, process_id=pid)
assert jax.process_count() == 2

import jax.numpy as jnp
import numpy as np
from neural_speech_decoder_tpu.parallel.mesh import batch_sharding
from neural_speech_decoder_tpu.training.optim import make_optimizer
from neural_speech_decoder_tpu.training.trainer import build_model, make_train_step

args = dict(model_type="gru_baseline", nInputFeatures=16, nClasses=40,
            nUnits=32, nLayers=2, dropout=0.0, strideLen=4, kernelLen=8,
            gaussianSmoothWidth=2.0, bidirectional=True, whiteNoiseSD=0.0,
            constantOffsetSD=0.0, lrStart=0.01, lrEnd=0.01, l2_decay=0.0,
            nBatch=10, seed=0, watch_log_freq=0, rng_impl="threefry2x32")
model = build_model(args, n_days=2)
params = model.init(jax.random.key(0))
tx, _ = make_optimizer(args)
state = {{"params": params, "opt_state": tx.init(params),
          "step": jnp.array(0)}}
mesh = make_global_mesh()           # 2 procs x 2 local devices = 4 x 1
assert mesh.devices.size == 4
b_shard = batch_sharding(mesh)
train_step = make_train_step(args, model, tx)

rng = np.random.default_rng(0)      # identical on both processes
B, T, U = 8, 64, 6
losses = []
for step in range(3):
    x = rng.standard_normal((B, T, 16)).astype(np.float32)
    y = rng.integers(1, 41, size=(B, U)).astype(np.int32)
    xl = rng.integers(32, T + 1, size=(B,)).astype(np.int32)
    yl = rng.integers(2, U + 1, size=(B,)).astype(np.int32)
    d = rng.integers(0, 2, size=(B,)).astype(np.int32)
    rows = local_rows(B)
    arrays = stage_local_batch(
        b_shard, tuple(a[rows] for a in (x, y, xl, yl, d)))
    key = jax.random.fold_in(jax.random.key(0), step)
    state, metrics = train_step(state, *arrays, key)
    losses.append(float(metrics["train/loss"]))
print("LOSSES", pid, is_primary(), ",".join(f"{{v:.10f}}" for v in losses),
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_losses() -> list[float]:
    """Same computation, one process, 8 virtual devices (conftest env)."""
    import jax
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
    )
    from neural_speech_decoder_tpu.training.optim import make_optimizer
    from neural_speech_decoder_tpu.training.trainer import (
        build_model,
        make_train_step,
    )

    args = dict(model_type="gru_baseline", nInputFeatures=16, nClasses=40,
                nUnits=32, nLayers=2, dropout=0.0, strideLen=4, kernelLen=8,
                gaussianSmoothWidth=2.0, bidirectional=True, whiteNoiseSD=0.0,
                constantOffsetSD=0.0, lrStart=0.01, lrEnd=0.01, l2_decay=0.0,
                nBatch=10, seed=0, watch_log_freq=0,
                rng_impl="threefry2x32")
    model = build_model(args, n_days=2)
    params = model.init(jax.random.key(0))
    tx, _ = make_optimizer(args)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.array(0)}
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    b_shard = batch_sharding(mesh)
    train_step = make_train_step(args, model, tx)
    rng = np.random.default_rng(0)
    B, T, U = 8, 64, 6
    losses = []
    for step in range(3):
        x = rng.standard_normal((B, T, 16)).astype(np.float32)
        y = rng.integers(1, 41, size=(B, U)).astype(np.int32)
        xl = rng.integers(32, T + 1, size=(B,)).astype(np.int32)
        yl = rng.integers(2, U + 1, size=(B,)).astype(np.int32)
        d = rng.integers(0, 2, size=(B,)).astype(np.int32)
        arrays = tuple(jax.device_put(a, b_shard) for a in (x, y, xl, yl, d))
        key = jax.random.fold_in(jax.random.key(0), step)
        state, metrics = train_step(state, *arrays, key)
        losses.append(float(metrics["train/loss"]))
    return losses


@pytest.mark.slow
def test_two_process_staging_bit_matches_single_process():
    port = str(_free_port())
    code = WORKER.format(root=ROOT)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out
    per_proc = {}
    for out in outs:
        m = re.search(r"LOSSES (\d) (True|False) ([\d.,-]+)", out)
        assert m, out
        per_proc[int(m.group(1))] = [float(v) for v in m.group(3).split(",")]
    assert set(per_proc) == {0, 1}
    # both processes observe the identical global loss trajectory
    np.testing.assert_array_equal(per_proc[0], per_proc[1])
    # and it matches the single-process data-parallel run to reduction
    # rounding (the cross-process Gloo all-reduce sums in a different
    # order than the single-process fused reduction, so not bit-exact)
    ref = _single_process_losses()
    np.testing.assert_allclose(per_proc[0], ref, rtol=1e-5)
