"""CTC loss parity vs torch.nn.CTCLoss (blank=0, zero_infinity=True)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neural_speech_decoder_tpu.ops.ctc import ctc_feasible, ctc_loss


def _random_case(rng, b=4, t=20, k=8, u=7):
    logits = rng.standard_normal((b, t, k)).astype(np.float32)
    input_lens = rng.integers(u + 3, t + 1, size=b).astype(np.int32)
    label_lens = rng.integers(1, u + 1, size=b).astype(np.int32)
    labels = rng.integers(1, k, size=(b, u)).astype(np.int32)
    for i in range(b):
        labels[i, label_lens[i]:] = 0
    return logits, input_lens, labels, label_lens


def _torch_ctc(logits, input_lens, labels, label_lens, reduction):
    import torch

    lp = torch.from_numpy(logits).log_softmax(2).permute(1, 0, 2)
    loss = torch.nn.CTCLoss(blank=0, reduction=reduction, zero_infinity=True)(
        lp,
        torch.from_numpy(labels),
        torch.from_numpy(input_lens),
        torch.from_numpy(label_lens),
    )
    return loss.numpy()


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_ctc_matches_torch(reduction):
    rng = np.random.default_rng(0)
    logits, input_lens, labels, label_lens = _random_case(rng)
    log_probs = jnp.asarray(logits)
    ours = ctc_loss(
        log_probs,
        jnp.asarray(input_lens),
        jnp.asarray(labels),
        jnp.asarray(label_lens),
        reduction=reduction,
    )
    ref = _torch_ctc(logits, input_lens, labels, label_lens, reduction)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_ctc_accepts_log_probs_or_logits():
    # log_softmax is idempotent; the reference feeds log-probs, optax feeds
    # logits — both must agree.
    rng = np.random.default_rng(1)
    logits, input_lens, labels, label_lens = _random_case(rng)
    import scipy.special as sp

    lp = sp.log_softmax(logits, axis=-1)
    a = ctc_loss(jnp.asarray(logits), jnp.asarray(input_lens),
                 jnp.asarray(labels), jnp.asarray(label_lens), reduction="none")
    b = ctc_loss(jnp.asarray(lp), jnp.asarray(input_lens),
                 jnp.asarray(labels), jnp.asarray(label_lens), reduction="none")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_zero_infinity_semantics():
    # A label longer than the input has no valid alignment; torch zeroes it.
    rng = np.random.default_rng(2)
    b, t, k, u = 3, 6, 5, 6
    logits = rng.standard_normal((b, t, k)).astype(np.float32)
    labels = rng.integers(1, k, size=(b, u)).astype(np.int32)
    input_lens = np.array([6, 2, 6], dtype=np.int32)
    label_lens = np.array([3, 6, 6], dtype=np.int32)
    labels[0, 3:] = 0
    # Row 2: force repeats so T == U but with repeats -> infeasible.
    labels[2] = np.array([1, 1, 2, 2, 3, 3])

    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(input_lens),
                    jnp.asarray(labels), jnp.asarray(label_lens),
                    reduction="none")
    ref = _torch_ctc(logits, input_lens, labels, label_lens, "none")
    feas = np.asarray(ctc_feasible(jnp.asarray(labels),
                                   jnp.asarray(label_lens),
                                   jnp.asarray(input_lens)))
    np.testing.assert_array_equal(feas, [True, False, False])
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
    assert np.asarray(ours)[1] == 0.0 and np.asarray(ours)[2] == 0.0


def test_ctc_grad_finite():
    import jax

    rng = np.random.default_rng(3)
    logits, input_lens, labels, label_lens = _random_case(rng)

    def f(lg):
        return ctc_loss(lg, jnp.asarray(input_lens), jnp.asarray(labels),
                        jnp.asarray(label_lens), reduction="sum")

    g = jax.grad(f)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
