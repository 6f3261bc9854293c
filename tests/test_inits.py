"""Distribution properties of the init helpers (models/common.py).

The reference's training quality hinges on its init schemes (orthogonal
recurrent weights, xavier input weights — ``model.py:59-63`` — and
torch's nn.Linear/GRU-bias uniform defaults). Exact RNG streams can't
match across frameworks; these tests pin what training parity actually
needs: the distribution family, support bounds, and scale.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.common import (
    orthogonal,
    torch_linear_init,
    uniform_bound,
    xavier_uniform,
)


def test_orthogonal_square_is_orthonormal():
    w = np.asarray(orthogonal(jax.random.key(0), (64, 64)))
    np.testing.assert_allclose(w @ w.T, np.eye(64), atol=1e-5)
    np.testing.assert_allclose(w.T @ w, np.eye(64), atol=1e-5)


def test_orthogonal_rectangular_has_orthonormal_minor_side():
    # [128, 64]: columns orthonormal (the smaller side)
    w = np.asarray(orthogonal(jax.random.key(1), (128, 64)))
    np.testing.assert_allclose(w.T @ w, np.eye(64), atol=1e-5)
    # singular values all 1 — norm-preserving in the recurrent direction
    s = np.linalg.svd(w, compute_uv=False)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_xavier_uniform_bounds_and_scale():
    fi, fo = 96, 160
    w = np.asarray(xavier_uniform(jax.random.key(2), (fi, fo)))
    bound = math.sqrt(6.0 / (fi + fo))
    assert np.abs(w).max() <= bound
    # uniform(-b, b): var = b^2/3; 5-sigma band on the sample variance
    n = w.size
    var = bound * bound / 3.0
    assert abs(w.var() - var) < 5 * var * math.sqrt(2.0 / n)
    assert abs(w.mean()) < 5 * math.sqrt(var / n)
    # explicit fan overrides change the bound (GRU w_ih uses torch's fans)
    w2 = np.asarray(
        xavier_uniform(jax.random.key(3), (fi, fo), fan_in=10, fan_out=10)
    )
    assert np.abs(w2).max() <= math.sqrt(6.0 / 20) + 1e-7
    assert np.abs(w2).max() > bound  # wider than the shape-derived bound


def test_torch_linear_init_matches_torch_default_scale():
    in_dim, out_dim = 200, 80
    w, b = torch_linear_init(jax.random.key(4), in_dim, out_dim)
    assert w.shape == (in_dim, out_dim) and b.shape == (out_dim,)
    bound = 1.0 / math.sqrt(in_dim)
    assert float(jnp.abs(w).max()) <= bound
    assert float(jnp.abs(b).max()) <= bound
    # kaiming-uniform(a=sqrt(5)) on a Linear reduces to exactly this
    # bound; cross-check against torch's realized support
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    lin = torch.nn.Linear(in_dim, out_dim)
    assert float(lin.weight.abs().max()) <= bound
    assert float(lin.bias.abs().max()) <= bound
    # and both samples actually fill the support (not a narrower dist)
    assert float(jnp.abs(w).max()) > 0.95 * bound
    assert float(lin.weight.abs().max()) > 0.95 * bound

    w_nb, b_nb = torch_linear_init(jax.random.key(5), 8, 4, bias=False)
    assert b_nb is None and w_nb.shape == (8, 4)


def test_uniform_bound_support():
    x = np.asarray(uniform_bound(jax.random.key(6), (4096,), 0.25))
    assert np.abs(x).max() <= 0.25
    assert np.abs(x).max() > 0.24  # fills the support
    assert abs(x.mean()) < 0.02
