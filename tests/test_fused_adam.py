"""Fused Pallas Adam(+L2) vs the optax chain oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neural_speech_decoder_tpu.ops.pallas.adam_kernel import fused_adam_update


def _tree(seed, shapes):
    rng = np.random.default_rng(seed)
    return {
        f"p{i}": jnp.asarray(rng.standard_normal(s), jnp.float32)
        for i, s in enumerate(shapes)
    }


SHAPES = [(16, 128), (8, 384), (3, 128), (7,), (41,), (2, 5, 128)]


@pytest.mark.parametrize("l2", [0.0, 1e-3])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_matches_optax_chain_over_steps(l2, use_pallas):
    lr0, lr1 = 0.02, 0.005
    n_steps = 4
    schedule = lambda c: lr0 + (lr1 - lr0) * c / 10.0

    steps = []
    if l2 > 0:
        steps.append(optax.add_decayed_weights(l2))
    steps += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=0.1, eps_root=0.0),
        optax.scale_by_learning_rate(schedule),
    ]
    tx = optax.chain(*steps)

    params = _tree(0, SHAPES)
    opt_state = tx.init(params)
    p_ref = params
    p_fused = params
    adam_idx = next(
        i for i, s in enumerate(opt_state)
        if isinstance(s, optax.ScaleByAdamState)
    )
    mu = opt_state[adam_idx].mu
    nu = opt_state[adam_idx].nu
    count = opt_state[adam_idx].count

    for step in range(n_steps):
        grads = _tree(100 + step, SHAPES)
        u, opt_state = tx.update(grads, opt_state, p_ref)
        p_ref = optax.apply_updates(p_ref, u)

        lr = schedule(count)
        p_fused, mu, nu = fused_adam_update(
            grads, p_fused, mu, nu, count, lr,
            b1=0.9, b2=0.999, eps=0.1, l2=l2,
            use_pallas=use_pallas, interpret=use_pallas,
        )
        count = count + 1

    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p_fused[k]), np.asarray(p_ref[k]),
            rtol=0, atol=1e-6, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(mu["p0"]), np.asarray(opt_state[adam_idx].mu["p0"]),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(nu["p0"]), np.asarray(opt_state[adam_idx].nu["p0"]),
        atol=1e-7,
    )


def test_trainer_fused_matches_optax_path():
    """make_train_step with fused_optimizer on vs off: same trajectories."""
    from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
    from neural_speech_decoder_tpu.data.batching import (
        choose_envelope,
        sample_batch,
    )
    from neural_speech_decoder_tpu.data.dataset import pack_days
    from neural_speech_decoder_tpu.training.optim import make_optimizer
    from neural_speech_decoder_tpu.training.trainer import (
        build_model,
        make_train_step,
    )

    ds = synthetic_dataset(
        seed=2, n_days=1, trials_per_day=8, n_channels=8,
        min_t=24, max_t=40, min_u=2, max_u=4,
    )
    train_ds = pack_days(ds["train"])
    t_max, u_max = choose_envelope(train_ds, time_multiple=16)
    base = {
        "model_type": "gru_baseline", "nInputFeatures": 8, "nClasses": 40,
        "nUnits": 16, "nLayers": 1, "dropout": 0.0, "strideLen": 2,
        "kernelLen": 4, "gaussianSmoothWidth": 2.0, "bidirectional": False,
        "whiteNoiseSD": 0.0, "constantOffsetSD": 0.0, "lrStart": 0.01,
        "lrEnd": 0.005, "l2_decay": 1e-4, "nBatch": 50, "seed": 0,
        "rng_impl": "threefry2x32",
    }
    results = {}
    for fused in (True, False):
        args = dict(base, fused_optimizer=fused)
        model = build_model(args, n_days=1)
        params = model.init(jax.random.key(0))
        tx, _ = make_optimizer(args)
        state = {"params": params, "opt_state": tx.init(params),
                 "step": jnp.array(0)}
        step_fn = make_train_step(args, model, tx)
        rng = np.random.default_rng(0)
        key = jax.random.key(0, impl="threefry2x32")
        losses = []
        for i in range(5):
            b = sample_batch(train_ds, rng, 4, t_max, u_max)
            state, metrics = step_fn(
                state, b.x, b.y, b.x_lens, b.y_lens, b.days,
                jax.random.fold_in(key, i),
            )
            losses.append(float(metrics["train/loss"]))
        results[fused] = (losses, state["params"])

    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-5)
    for ka, kb in zip(
        jax.tree.leaves(results[True][1]), jax.tree.leaves(results[False][1])
    ):
        np.testing.assert_allclose(
            np.asarray(ka), np.asarray(kb), atol=2e-6
        )
