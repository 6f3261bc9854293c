"""Pallas CTC kernel vs optax.ctc_loss (values and gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from neural_speech_decoder_tpu.ops.pallas.ctc_kernel import ctc_loss_tpu


def case(seed=0, b=4, t=20, k=8, u=6):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, k)).astype(np.float32)
    input_lens = rng.integers(u + 4, t + 1, size=b).astype(np.int32)
    label_lens = rng.integers(1, u + 1, size=b).astype(np.int32)
    labels = rng.integers(1, k, size=(b, u)).astype(np.int32)
    for i in range(b):
        labels[i, label_lens[i]:] = 0
    return logits, input_lens, labels, label_lens


def optax_ref(logits, input_lens, labels, label_lens):
    t = logits.shape[1]
    u = labels.shape[1]
    lpad = 1.0 - (np.arange(t)[None] < input_lens[:, None]).astype(np.float32)
    ypad = 1.0 - (np.arange(u)[None] < label_lens[:, None]).astype(np.float32)
    return optax.ctc_loss(logits, lpad, labels, ypad, blank_id=0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_matches_optax(seed):
    logits, il, y, yl = case(seed)
    ours = ctc_loss_tpu(
        jnp.asarray(logits), jnp.asarray(il), jnp.asarray(y), jnp.asarray(yl),
        True,  # interpret
    )
    ref = optax_ref(logits, il, y, yl)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4,
                               atol=1e-4)


def test_grad_matches_optax():
    logits, il, y, yl = case(3)

    def ours_sum(lg):
        return jnp.sum(
            ctc_loss_tpu(lg, jnp.asarray(il), jnp.asarray(y),
                         jnp.asarray(yl), True)
        )

    def ref_sum(lg):
        t, u = lg.shape[1], y.shape[1]
        lpad = 1.0 - (jnp.arange(t)[None] < il[:, None]).astype(jnp.float32)
        ypad = 1.0 - (jnp.arange(u)[None] < yl[:, None]).astype(jnp.float32)
        return jnp.sum(optax.ctc_loss(lg, lpad, jnp.asarray(y), ypad))

    g_ours = jax.grad(ours_sum)(jnp.asarray(logits))
    g_ref = jax.grad(ref_sum)(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=2e-4
    )


def test_empty_target_matches_optax():
    # Empty label: loss = -sum of blank log-probs; a single final state must
    # not be double-counted (would understate NLL by log 2).
    logits = np.random.default_rng(5).standard_normal((2, 8, 5)).astype(
        np.float32
    )
    labels = np.zeros((2, 3), np.int32)
    labels[1, :2] = [1, 2]
    label_lens = np.array([0, 2], np.int32)
    input_lens = np.array([8, 8], np.int32)
    ours = ctc_loss_tpu(
        jnp.asarray(logits), jnp.asarray(input_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), True,
    )
    ref = optax_ref(logits, input_lens, labels, label_lens)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4,
                               atol=1e-4)


def test_repeated_labels_and_short_inputs():
    # repeats force the skip-transition mask; tight input length
    logits = np.random.default_rng(4).standard_normal((2, 10, 5)).astype(
        np.float32
    )
    labels = np.array([[1, 1, 2, 0], [3, 3, 3, 0]], np.int32)
    label_lens = np.array([3, 3], np.int32)
    input_lens = np.array([10, 7], np.int32)
    ours = ctc_loss_tpu(
        jnp.asarray(logits), jnp.asarray(input_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), True,
    )
    ref = optax_ref(logits, input_lens, labels, label_lens)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4,
                               atol=1e-4)
