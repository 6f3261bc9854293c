"""Statistical/property tests for the counter-hash dropout RNG.

``ops/hashrng.py`` replaces ``jax.random.bernoulli`` at every XLA-level
dropout site (and the interpret-mode Pallas kernels reuse the same
finalizer), so all training-path dropout quality rests on it. These tests
pin the distributional properties training silently depends on:
Bernoulli rate, uniformity, row/column decorrelation, seed/salt stream
independence, and the dropout wrapper's scaling semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.ops.hashrng import (
    hash_dropout,
    keep_mask2d,
    key_to_seed,
    uniform2d,
)

SHAPE = (512, 384)
N = SHAPE[0] * SHAPE[1]


def _u(seed=1, salt=2, shape=SHAPE):
    return np.asarray(uniform2d(jnp.int32(seed), jnp.int32(salt), shape))


def test_uniform_bounds_mean_variance():
    u = _u()
    assert u.min() >= 0.0 and u.max() < 1.0
    # mean 1/2 ± ~4 sigma (sigma = sqrt(1/12/N))
    assert abs(u.mean() - 0.5) < 4 * np.sqrt(1 / 12 / N)
    assert abs(u.var() - 1 / 12) < 1e-3


def test_uniform_bucket_uniformity():
    """Chi-square over 16 equal buckets stays far from catastrophic."""
    u = _u(seed=7, salt=3)
    counts, _ = np.histogram(u, bins=16, range=(0.0, 1.0))
    expected = N / 16
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # df=15: mean 15, std sqrt(30); 60 is ~8 sigma — catches structural
    # non-uniformity, not noise
    assert chi2 < 60, f"chi2={chi2}, counts={counts}"


def test_no_row_or_column_artifacts():
    """Per-row / per-column means stay near 1/2 — a broken iota mix would
    stripe the mask along one axis."""
    u = _u(seed=11, salt=5)
    row_means = u.mean(axis=1)
    col_means = u.mean(axis=0)
    tol_r = 5 * np.sqrt(1 / 12 / SHAPE[1])
    tol_c = 5 * np.sqrt(1 / 12 / SHAPE[0])
    assert np.abs(row_means - 0.5).max() < tol_r
    assert np.abs(col_means - 0.5).max() < tol_c


def test_adjacent_cell_decorrelation():
    """Neighbouring counters must not produce correlated values (dropout
    masks would then develop spatial structure)."""
    u = _u(seed=13, salt=1)
    for a, b in [
        (u[:, :-1].ravel(), u[:, 1:].ravel()),  # along columns
        (u[:-1, :].ravel(), u[1:, :].ravel()),  # along rows
    ]:
        r = np.corrcoef(a, b)[0, 1]
        assert abs(r) < 0.01, r


def test_deterministic_and_stream_independent():
    a = _u(seed=3, salt=4)
    assert np.array_equal(a, _u(seed=3, salt=4))  # same stream, same bits
    for other in (_u(seed=4, salt=4), _u(seed=3, salt=5)):
        assert not np.array_equal(a, other)
        r = np.corrcoef(a.ravel(), other.ravel())[0, 1]
        assert abs(r) < 0.01, r


@pytest.mark.parametrize("rate", [0.1, 0.4, 0.75])
def test_keep_rate_matches_bernoulli(rate):
    keep = np.asarray(
        keep_mask2d(jnp.int32(21), jnp.int32(0), SHAPE, rate)
    )
    frac = keep.mean()
    sigma = np.sqrt(rate * (1 - rate) / N)
    assert abs(frac - (1 - rate)) < 5 * sigma


def test_hash_dropout_semantics():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 384)), jnp.float32)
    key = jax.random.key(9)
    # eval / rate-0 / keyless: identity
    assert hash_dropout(key, x, 0.4, train=False) is x
    assert hash_dropout(key, x, 0.0, train=True) is x
    assert hash_dropout(None, x, 0.4, train=True) is x
    # train: kept entries scaled by 1/(1-rate), dropped entries exactly 0
    rate = 0.4
    y = np.asarray(hash_dropout(key, x, rate, train=True))
    xn = np.asarray(x)
    kept = y != 0.0
    np.testing.assert_allclose(y[kept], xn[kept] / (1 - rate), rtol=1e-6)
    # the zero pattern reproduces keep_mask2d on the flattened shape
    keep = np.asarray(
        keep_mask2d(key_to_seed(key), jnp.int32(0), (24, 384), rate)
    ).reshape(x.shape)
    # (a true x==0 would alias; the standard-normal draw has none)
    assert np.array_equal(kept, keep)


def test_key_to_seed_covers_key_impls():
    """Both the default threefry keys and the trainer's rbg keys fold to a
    deterministic int32 scalar that varies with the seed.

    Regression: rbg key_data is the threefry data repeated ([a, b, a, b]);
    a symmetric XOR fold cancels it to 0 for EVERY rbg key — which froze
    the hash-dropout seed at 0 across all steps of an rbg-keyed training
    run (the trainer's default). The fold must be position-sensitive."""
    for impl in ("threefry2x32", "rbg"):
        k = jax.random.key(5, impl=impl)
        s1 = int(key_to_seed(k))
        s2 = int(key_to_seed(k))
        assert s1 == s2
        assert np.int32(s1) == s1  # fits int32
        k2 = jax.random.key(6, impl=impl)
        assert int(key_to_seed(k2)) != s1


def test_key_to_seed_varies_across_training_steps():
    """The trainer derives per-step keys as fold_in(base, step) with
    rng_impl='rbg' (trainer.py); every step must see a distinct dropout
    seed, else hash-dropout degenerates to a fixed pruning mask."""
    for impl in ("threefry2x32", "rbg"):
        base = jax.random.key(0, impl=impl)
        seeds = [
            int(key_to_seed(jax.random.fold_in(base, step)))
            for step in range(32)
        ]
        assert len(set(seeds)) == len(seeds), (impl, seeds[:8])
