"""Hand-tiled Pallas TPU matmul for the GRU projection GEMMs.

Motivation (measured, scripts/exp_matmul_kernel.py / BASELINE.md): at the
step's exact production shapes XLA's GEMM runs at 107-158 TF/s on v5e; a
hand-tiled Pallas matmul with a float32 VMEM accumulator and a
(512, 2048, 512) tile reaches 131-170 TF/s — 1.07-1.22x — on all three
step-dominant shapes (layer 1-4 input projection, its dX, its dW). This
module turns that experiment into a production path: a custom-VJP
projection matmul whose forward AND both backward GEMMs run the tiled
kernel, with the bias add fused into the forward epilogue (so the f32
accumulator, not a second HBM pass, feeds the bias add and the bf16
downcast).

Reference behavior being accelerated: the per-layer input projections of
torch's cuDNN GRU (/root/reference/src/neural_decoder/model.py:75-81,
the ``nn.GRU`` input matmuls) — here one flat ``[B*L, F] x [F, 3H*D]``
GEMM per layer (models/gru.py::gru_encode).

Three contraction layouts, all on a ``(rows, cols, reduce)`` grid with
the reduction axis innermost ("arbitrary") so the f32 accumulator block
in VMEM scratch is reused across the K-loop:

  * ``nn``: ``[M,K] @ [K,N] -> [M,N]``          (forward)
  * ``nt``: ``[M,N] @ [K,N]^T -> [M,K]``        (dX = g @ W^T)
  * ``tn``: ``[M,K]^T @ [M,N] -> [K,N]``        (dW = x^T @ g)

``nt``/``tn`` contract via ``lax.dot_general`` dimension numbers instead
of materializing transposed operands in HBM (the experiment's dW row
measured the plain-NN kernel on a PRE-transposed array; here the
transpose-free layouts keep the win without the [K,M] copy).

Row dimensions that don't divide the tile are zero-padded up (zeros are
exact for the reduction layouts and sliced off for output rows); the
column/reduction dims must be multiples of 128 — ``projection_kernel_viable``
is the caller-visible gate, and every caller keeps the XLA einsum as its
fallback twin and correctness oracle (tests/test_pallas_matmul.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Best tile from the on-chip sweep (BASELINE.md "Hand-written Pallas
# matmul experiment"): wins every production shape.
_BM, _BN, _BK = 512, 2048, 512
_VMEM_MB = 64

_DIMNUMS = {
    # (lhs contracting dim, rhs contracting dim)
    "nn": (1, 0),
    "nt": (1, 1),
    "tn": (0, 0),
}


def _make_kernel(kind: str, has_bias: bool):
    lc, rc = _DIMNUMS[kind]

    def kernel(*refs):
        if has_bias:
            a_ref, b_ref, bias_ref, o_ref, acc_ref = refs
        else:
            a_ref, b_ref, o_ref, acc_ref = refs
            bias_ref = None

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[:],
            b_ref[:],
            (((lc,), (rc,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            acc = acc_ref[:]
            if bias_ref is not None:
                acc = acc + bias_ref[:].astype(jnp.float32)
            o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


def _pick(dim: int, candidates) -> int | None:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _pad_rows(x: jax.Array, mult: int) -> jax.Array:
    m = x.shape[0]
    pad = (-m) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _tiles(kind: str, rows: int, cols: int, red: int):
    """(block_rows, block_cols, block_red) for the OUTPUT rows/cols and the
    reduction dim, or None when a dim can't tile. For ``nn``/``nt`` the
    output rows are zero-padded up to the tile, so any row count works;
    for ``tn`` the output rows are the weight's K axis and must divide."""
    def pad_tile(d):
        # The dim is zero-padded up to the block, so any count works;
        # small dims get the smallest block that covers them.
        if d >= _BM:
            return _BM
        return next(c for c in (128, 256, _BM) if d <= c)

    if kind == "tn":
        # Output rows = weight K axis (must divide); reduction = padded M.
        br = _pick(rows, [_BM, 256, 128])
        bk = pad_tile(red)
    else:
        br = pad_tile(rows)
        bk = _pick(red, [_BK, 256, 128])
    bc = _pick(cols, [_BN, 1024, 512, 256, 128])
    if br is None or bc is None or bk is None:
        return None
    return br, bc, bk


def projection_kernel_viable(m: int, k: int, n: int) -> bool:
    """True when all three GEMMs of ``projection_matmul`` can tile: the
    column and reduction dims (K and N — both appear in each role across
    fwd/dX/dW) must be multiples of 128; M is zero-padded freely."""
    del m
    return k % 128 == 0 and n % 128 == 0


def tiled_matmul(
    a: jax.Array,
    b: jax.Array,
    *,
    kind: str = "nn",
    bias: jax.Array | None = None,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array | None:
    """One tiled GEMM, or None when the shape can't tile (caller falls
    back to its XLA twin). ``bias`` (shape [cols], added in f32 in the
    epilogue) is only meaningful for ``kind='nn'``."""
    if a.ndim != 2 or b.ndim != 2:
        return None
    # Contracted-dim mismatches are caller bugs, not untileable shapes:
    # raise (an out-of-range grid/index map could otherwise produce
    # silently wrong output) rather than fall back.
    if kind == "nn":
        (m, k), (k2, n) = a.shape, b.shape
        mismatch = k != k2
        rows, cols, red = m, n, k
    elif kind == "nt":
        (m, n), (k2, n2) = a.shape, b.shape
        mismatch = n != n2
        rows, cols, red = m, k2, n
    elif kind == "tn":
        (m, k), (m2, n) = a.shape, b.shape
        mismatch = m != m2
        rows, cols, red = k, n, m
    else:  # pragma: no cover - internal misuse
        raise ValueError(f"unknown kind {kind!r}")
    if mismatch:
        raise ValueError(
            f"tiled_matmul(kind={kind!r}): contracted dims disagree: "
            f"a={a.shape} b={b.shape}"
        )
    t = _tiles(kind, rows, cols, red)
    if t is None:
        return None
    br, bc, bk = t

    out_dtype = out_dtype or a.dtype
    # Zero-pad the freely-paddable dims: output rows (sliced off after) and,
    # for 'tn', the reduction dim M on BOTH operands (zeros are exact).
    if kind == "nn":
        a = _pad_rows(a, br)
        grid = (a.shape[0] // br, cols // bc, red // bk)
        specs = [
            pl.BlockSpec((br, bk), lambda i, j, r: (i, r)),
            pl.BlockSpec((bk, bc), lambda i, j, r: (r, j)),
        ]
        out_rows = a.shape[0]
    elif kind == "nt":
        a = _pad_rows(a, br)
        grid = (a.shape[0] // br, cols // bc, red // bk)
        specs = [
            pl.BlockSpec((br, bk), lambda i, j, r: (i, r)),
            pl.BlockSpec((bc, bk), lambda i, j, r: (j, r)),
        ]
        out_rows = a.shape[0]
    else:  # tn
        a = _pad_rows(a, bk)
        b = _pad_rows(b, bk)
        grid = (rows // br, cols // bc, a.shape[0] // bk)
        specs = [
            pl.BlockSpec((bk, br), lambda i, j, r: (r, i)),
            pl.BlockSpec((bk, bc), lambda i, j, r: (r, j)),
        ]
        out_rows = rows

    args = [a, b]
    if bias is not None:
        assert kind == "nn"
        args.append(bias.reshape(1, cols))
        specs.append(pl.BlockSpec((1, bc), lambda i, j, r: (0, j)))

    out = pl.pallas_call(
        _make_kernel(kind, bias is not None),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((br, bc), lambda i, j, r: (i, j)),
        out_shape=jax.ShapeDtypeStruct((out_rows, cols), out_dtype),
        scratch_shapes=[pltpu.VMEM((br, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_MB * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[:rows] if out_rows != rows else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def projection_matmul(
    x: jax.Array, w: jax.Array, bias: jax.Array, interpret: bool = False
) -> jax.Array:
    """``(x @ w + bias)`` with every GEMM on the tiled Pallas kernel.

    Args:
      x: ``[M, K]`` activations (compute dtype — bf16 on the perf path).
      w: ``[K, N]`` weight, same dtype as ``x``.
      bias: ``[N]`` float32, added in f32 before the downcast (matching
        the XLA twin's ``einsum(f32 out) + bias`` then ``astype`` order).

    Returns ``[M, N]`` in ``x.dtype``. Callers must pre-check
    ``projection_kernel_viable`` — non-tiling shapes raise here rather
    than silently fall back (the silent path lives at the call site).
    """
    y = tiled_matmul(x, w, kind="nn", bias=bias, interpret=interpret)
    if y is None:
        raise ValueError(
            f"projection_matmul shapes don't tile: {x.shape} @ {w.shape}"
        )
    return y


def _projection_fwd(x, w, bias, interpret):
    return projection_matmul(x, w, bias, interpret), (x, w)


def _projection_bwd(interpret, res, g):
    x, w = res
    dx = tiled_matmul(g, w, kind="nt", out_dtype=x.dtype, interpret=interpret)
    dw = tiled_matmul(x, g, kind="tn", out_dtype=w.dtype, interpret=interpret)
    db = jnp.sum(g.astype(jnp.float32), axis=0)
    return dx, dw, db


projection_matmul.defvjp(_projection_fwd, _projection_bwd)
