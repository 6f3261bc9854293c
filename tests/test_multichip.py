"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from neural_speech_decoder_tpu.parallel.mesh import make_mesh


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_entry_forward_compiles():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, (256 - 32) // 4 + 1, 41)
    assert np.isfinite(np.asarray(out)).all()


def test_dp_matches_single_device_loss():
    """Data-parallel training step must produce the same loss/update as the
    single-device run (same batch, same key)."""
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.parallel.mesh import (
        batch_sharding,
        replicated_sharding,
    )
    from neural_speech_decoder_tpu.training.optim import make_optimizer
    from neural_speech_decoder_tpu.training.trainer import (
        build_model,
        make_train_step,
    )

    args = {
        "model_type": "gru_baseline",
        "nInputFeatures": 16,
        "nClasses": 40,
        "nUnits": 32,
        "nLayers": 2,
        "dropout": 0.0,
        "strideLen": 4,
        "kernelLen": 8,
        "gaussianSmoothWidth": 2.0,
        "bidirectional": True,
        "whiteNoiseSD": 0.0,
        "constantOffsetSD": 0.0,
        "lrStart": 0.01,
        "lrEnd": 0.01,
        "l2_decay": 0.0,
        "nBatch": 10,
        "seed": 0,
    }
    model = build_model(args, n_days=2)
    tx, _ = make_optimizer(args)
    rng = np.random.default_rng(0)
    b, t, u = 8, 48, 6
    x = rng.standard_normal((b, t, 16)).astype(np.float32)
    y = rng.integers(1, 41, size=(b, u)).astype(np.int32)
    x_lens = np.full((b,), t, np.int32)
    y_lens = np.full((b,), u, np.int32)
    days = rng.integers(0, 2, size=(b,)).astype(np.int32)
    key = jax.random.key(1)

    losses = {}
    for n_data in (1, 4):
        mesh = make_mesh(n_data=n_data, n_model=1,
                         devices=jax.devices()[:n_data])
        params = model.init(jax.random.key(0))
        params = jax.device_put(params, replicated_sharding(mesh))
        state = {
            "params": params,
            "opt_state": jax.jit(tx.init)(params),
            "step": jnp.array(0),
        }
        bsh = batch_sharding(mesh)
        arrays = [jax.device_put(a, bsh) for a in (x, y, x_lens, y_lens, days)]
        step_fn = make_train_step(args, model, tx)
        new_state, metrics = step_fn(state, *arrays, key)
        losses[n_data] = (
            float(metrics["train/loss"]),
            np.asarray(jax.device_get(new_state["params"]["fc"]["weight"])),
        )
    np.testing.assert_allclose(losses[1][0], losses[4][0], rtol=1e-5)
    np.testing.assert_allclose(losses[1][1], losses[4][1], atol=1e-5)


def test_pallas_kernel_under_batch_sharded_jit():
    """The Pallas GRU scan composes with GSPMD batch sharding: a jitted
    call on DP-sharded inputs matches the unsharded result and keeps the
    batch axis sharded (the multi-chip production path runs the kernel
    inside the sharded train step)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neural_speech_decoder_tpu.ops.pallas.gru_scan import gru_sequence

    mesh = make_mesh(n_data=4, n_model=2)
    l, d, b, h = 8, 2, 16, 8
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((l, d, b, 3 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, h, 3 * h)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((d, 3 * h)) * 0.1, jnp.float32)

    ref = gru_sequence(xp, w, bias, True)
    xp_s = jax.device_put(
        xp, NamedSharding(mesh, P(None, None, "data", None))
    )
    w_s = jax.device_put(w, NamedSharding(mesh, P()))
    b_s = jax.device_put(bias, NamedSharding(mesh, P()))
    out = jax.jit(lambda x, ww, bb: gru_sequence(x, ww, bb, True))(
        xp_s, w_s, b_s
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert "data" in str(out.sharding.spec)
