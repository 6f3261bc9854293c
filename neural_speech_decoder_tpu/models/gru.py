"""Stacked (bi)GRU CTC decoder — the framework's baseline encoder.

Capability parity with the reference ``GRUDecoder`` (``model.py:7-123``):
Gaussian smoothing (20 taps, torch-"same" padding) → per-day affine →
Softsign → temporal unfold (k=32, s=4) → 5-layer bidirectional GRU (H=1024)
→ linear head to ``n_classes + 1`` CTC logits.

TPU-first redesign (not a translation):
  * The ``[B, L, C*k]`` unfold is never materialized: layer-0's input
    projection for all directions is one strided conv
    ``[B,T,256] ⊛ [32,256,3H·dirs]`` straight onto the MXU
    (``ops/unfold.py::unfold_matmul``), replacing torch's
    Unfold→cuDNN-GRU input matmul.
  * Each layer precomputes input projections for *all* timesteps as one
    large matmul, so the ``lax.scan`` body contains only the recurrent
    ``[dirs·B, H] @ [H, 3H]`` matmul + gate pointwise ops (VPU-fused).
  * Both directions advance in one scan step via a batched einsum over a
    leading direction axis; the backward direction consumes time-flipped
    inputs (equivalent to torch's unpacked bidirectional GRU over padded
    batches).
  * Per-layer inter-layer dropout (train only), as torch ``nn.GRU(dropout=)``.

Intentional divergence (SURVEY.md §7 quirk policy): the reference's 24 dead
``inpLayer{i}`` Linears (``model.py:66-73``, created but never called) are
not recreated.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.day_affine import day_affine, init_day_affine
from ..ops.gaussian import gaussian_smooth
from ..ops.pallas.gru_scan import gru_sequence
from ..ops.pallas.matmul import projection_kernel_viable as _mm_viable
from ..ops.unfold import unfold_matmul, unfold_output_length
from ..parallel.kernel_mesh import kernel_batch_shards
from .common import orthogonal, torch_linear_init, uniform_bound, xavier_uniform

Params = dict[str, Any]

_warned_pallas_fallback = False
_warned_matmul_fallback = False


def _pallas_scan_gate(backend: str, hidden: int, batch: int,
                      n_devices: int = 1) -> bool:
    """Auto-gate for the Pallas GRU scan kernel (needs lane/sublane-tiled
    shapes: H % 128, B % 16). Warns once when running on TPU but the shapes
    force the slow ``lax.scan`` path — a user with e.g. B=60 should see why
    throughput halved rather than silently degrade.

    Multi-device runs keep the kernel path when a kernel mesh is
    registered (parallel/kernel_mesh.py): the call is shard_map-wrapped
    over the mesh's batch axis, so each device runs the kernel on its
    local batch shard and the tile constraints apply *per shard*. With no
    registered mesh the XLA path is used instead — a bare Mosaic custom
    call has no GSPMD partitioning rule, so XLA would all-gather the
    sharded operands and run the kernel replicated on every chip."""
    shards = kernel_batch_shards(batch, tile=16, n_devices=n_devices)
    tiled = hidden % 128 == 0 and batch % 16 == 0
    ok = shards is not None and tiled
    if backend == "tpu" and not ok:
        global _warned_pallas_fallback
        if not _warned_pallas_fallback:
            _warned_pallas_fallback = True
            import warnings

            why = (
                f"GRU shapes (hidden={hidden}, batch={batch}) are not "
                f"tile-aligned for the Pallas scan kernel (needs hidden "
                f"% 128 == 0 and batch % 16 == 0); pad the batch or "
                f"hidden size to recover full throughput."
                if not tiled
                else f"multi-device run ({n_devices} devices) has no "
                f"registered kernel mesh whose batch axis covers all "
                f"devices with batch={batch} splitting into %16 shards "
                f"(parallel/kernel_mesh.py); the Pallas GRU scan cannot "
                f"be shard_mapped."
            )
            warnings.warn(
                f"{why} Falling back to the ~35% slower lax.scan path.",
                stacklevel=3,
            )
    return backend == "tpu" and ok


@dataclasses.dataclass(frozen=True)
class GRUConfig:
    neural_dim: int = 256
    n_classes: int = 40  # excl. blank; head outputs n_classes + 1
    hidden_dim: int = 1024
    num_layers: int = 5
    n_days: int = 24
    dropout: float = 0.4
    stride_len: int = 4
    kernel_len: int = 32
    gaussian_smooth_width: float = 2.0
    gaussian_kernel_size: int = 20  # fixed in the reference (model.py:40-42)
    bidirectional: bool = True
    # Recurrence implementation: None = auto (Pallas kernel on TPU when
    # shapes are tile-aligned, lax.scan custom-VJP path otherwise).
    use_pallas: bool | None = None
    # Layer 1+ input-projection GEMMs on the hand-tiled Pallas matmul
    # (ops/pallas/matmul.py — fwd, dX and dW all kernelized, bias fused
    # into the f32 epilogue). None = auto: **OFF**. The kernel wins
    # isolated (1.07-1.22x, exp_matmul_kernel.py) but the round-4
    # full-step A/B measured a 15% REGRESSION when integrated (517 vs
    # 441 seq/s, scripts/exp_matmul_fullstep_ab.py; BASELINE.md
    # "Hand-tiled matmul full-step A/B") — measured-NO-GAIN, kept as a
    # documented experiment behind this flag.
    use_pallas_matmul: bool | None = None
    dtype: Any = jnp.float32  # parameter dtype
    # Activation/matmul dtype. bfloat16 feeds the MXU at full rate with f32
    # accumulation (preferred_element_type) — ~2-3x train throughput on TPU
    # at indistinguishable CTC training quality; float32 gives exact torch
    # parity for tests.
    compute_dtype: Any = jnp.float32

    @property
    def num_dirs(self) -> int:
        return 2 if self.bidirectional else 1

    @property
    def input_dim(self) -> int:
        return self.neural_dim * self.kernel_len

    @property
    def n_out(self) -> int:
        return self.n_classes + 1


def init_gru_params(key: jax.Array, cfg: GRUConfig) -> Params:
    """Initialize the full parameter pytree.

    Layout per GRU layer (gate order r,z,n along the 3H axis, matching torch
    chunking so reference checkpoints can be imported):
      w_ih: [dirs, in_dim, 3H]   (xavier-uniform, model.py:63)
      w_hh: [dirs, H, 3H]        (orthogonal, model.py:61)
      b_ih, b_hh: [dirs, 3H]     (torch default U(-1/√H, 1/√H))
    """
    h = cfg.hidden_dim
    d = cfg.num_dirs
    bound = 1.0 / math.sqrt(h)
    keys = jax.random.split(key, cfg.num_layers + 2)

    layers = []
    for li in range(cfg.num_layers):
        in_dim = cfg.input_dim if li == 0 else h * d
        lk = jax.random.split(keys[li], 4 * d)
        w_ih = jnp.stack(
            [xavier_uniform(lk[4 * i], (in_dim, 3 * h), cfg.dtype) for i in range(d)]
        )
        # torch stores weight_hh as [3H, H] and orthogonalizes that matrix;
        # we keep [H, 3H] so init the transpose-orthogonal equivalent.
        w_hh = jnp.stack(
            [
                orthogonal(lk[4 * i + 1], (3 * h, h)).T.astype(cfg.dtype)
                for i in range(d)
            ]
        )
        b_ih = jnp.stack(
            [uniform_bound(lk[4 * i + 2], (3 * h,), bound, cfg.dtype) for i in range(d)]
        )
        b_hh = jnp.stack(
            [uniform_bound(lk[4 * i + 3], (3 * h,), bound, cfg.dtype) for i in range(d)]
        )
        layers.append({"w_ih": w_ih, "w_hh": w_hh, "b_ih": b_ih, "b_hh": b_hh})

    fc_w, fc_b = torch_linear_init(keys[-2], h * d, cfg.n_out, cfg.dtype)
    return {
        "day": init_day_affine(cfg.n_days, cfg.neural_dim, cfg.dtype),
        "gru": {"layers": layers},
        "fc": {"weight": fc_w, "bias": fc_b},
    }


def _gru_gates(xp_t, hp, hdim):
    """Gate math in float32. Returns (r, z, n, hp_n)."""
    xp_t = xp_t.astype(jnp.float32)
    r = jax.nn.sigmoid(xp_t[..., :hdim] + hp[..., :hdim])
    z = jax.nn.sigmoid(xp_t[..., hdim : 2 * hdim] + hp[..., hdim : 2 * hdim])
    hp_n = hp[..., 2 * hdim :]
    n = jnp.tanh(xp_t[..., 2 * hdim :] + r * hp_n)
    return r, z, n, hp_n


@jax.custom_vjp
def _gru_layer(
    xp: jax.Array, w_hh: jax.Array, b_hh: jax.Array, h0: jax.Array
) -> jax.Array:
    """Run one (possibly bidirectional) GRU layer given precomputed input
    projections.

    Args:
      xp: ``[L, D, B, 3H]`` input projections (+b_ih), direction 1 (if any)
        already time-flipped.
      w_hh: ``[D, H, 3H]``; b_hh: ``[D, 3H]``; h0: ``[D, B, H]``.

    Returns: ``[L, D, B, H]`` hidden states per step (direction 1 still in
    flipped time order).

    Gate math runs in float32 (f32 accumulation out of the recurrent matmul);
    the carried state is cast back to the compute dtype so the per-step
    matmul feeds the MXU at the bf16 rate under mixed precision.

    A custom VJP (``_gru_layer_bwd``) replaces XLA's scan autodiff: the
    naive derivative accumulates the ``[D, H, 3H]`` weight gradient in the
    loop carry (tens of MB of HBM traffic per timestep); ours carries only
    ``dh``, stores per-step gate grads, and forms ``dW_hh`` as one large
    batched matmul afterwards — backward cost drops to ~2 matmuls/step.
    """
    hdim = h0.shape[-1]
    compute_dtype = xp.dtype
    w = w_hh.astype(compute_dtype)
    b = b_hh.astype(jnp.float32)

    def step(h, xp_t):
        hp = jnp.einsum(
            "dbh,dhk->dbk", h, w, preferred_element_type=jnp.float32
        ) + b[:, None, :]
        r, z, n, _ = _gru_gates(xp_t, hp, hdim)
        h_new = ((1.0 - z) * n + z * h.astype(jnp.float32)).astype(compute_dtype)
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, xp)
    return ys


def _gru_layer_fwd(xp, w_hh, b_hh, h0):
    ys = _gru_layer(xp, w_hh, b_hh, h0)
    return ys, (xp, w_hh, b_hh, h0, ys)


def _gru_layer_bwd(res, dys):
    xp, w_hh, b_hh, h0, ys = res
    hdim = h0.shape[-1]
    cdt = xp.dtype
    w = w_hh.astype(cdt)
    b = b_hh.astype(jnp.float32)
    h_prev = jnp.concatenate([h0[None], ys[:-1]], axis=0)  # [L, D, B, H]

    def bstep(dh, inputs):
        dy, xp_t, hprev_t = inputs
        dh_tot = dh + dy.astype(jnp.float32)
        # Recompute gates (cheaper than storing them: one extra matmul/step
        # instead of 3x[L,D,B,H] residuals round-tripping through HBM).
        hp = jnp.einsum(
            "dbh,dhk->dbk", hprev_t, w, preferred_element_type=jnp.float32
        ) + b[:, None, :]
        r, z, n, hp_n = _gru_gates(xp_t, hp, hdim)
        hprev_f = hprev_t.astype(jnp.float32)
        dz = dh_tot * (hprev_f - n)
        dn = dh_tot * (1.0 - z)
        da_n = dn * (1.0 - n * n)
        dr = da_n * hp_n
        da_z = dz * z * (1.0 - z)
        da_r = dr * r * (1.0 - r)
        dhp_n = da_n * r
        dhp = jnp.concatenate([da_r, da_z, dhp_n], axis=-1).astype(cdt)
        dh_prev = dh_tot * z + jnp.einsum(
            "dbk,dhk->dbh", dhp, w, preferred_element_type=jnp.float32
        )
        dxp_t = jnp.concatenate([da_r, da_z, da_n], axis=-1).astype(cdt)
        return dh_prev, (dhp, dxp_t)

    dh_last = jnp.zeros(h0.shape, jnp.float32)
    dh0, (dhp_seq, dxp_seq) = jax.lax.scan(
        bstep, dh_last, (dys, xp, h_prev), reverse=True
    )
    # Weight/bias grads as single large contractions over (L, B).
    dw = jnp.einsum(
        "ldbh,ldbk->dhk", h_prev, dhp_seq, preferred_element_type=jnp.float32
    ).astype(w_hh.dtype)
    db = jnp.sum(dhp_seq.astype(jnp.float32), axis=(0, 2)).astype(b_hh.dtype)
    return dxp_seq, dw, db, dh0.astype(h0.dtype)


_gru_layer.defvjp(_gru_layer_fwd, _gru_layer_bwd)


def _gru_sequence_sharded(xp, w_hh, b_hh):
    """``gru_sequence`` on the shared batch-sharded kernel path
    (``parallel.kernel_mesh.batch_shard_mapped``): each device scans its
    own batch shard; weights enter replicated (their cotangents are
    psummed by shard_map's transpose). ``tile=16`` enforces the scan
    kernel's per-SHARD batch tiling even on forced ``use_pallas=True``
    runs. Returns **None** when a multi-device mesh can't map the batch
    that way (tensor parallelism, no registered mesh, mis-tiled shards) —
    the caller falls back to the XLA twin. Off-TPU backends run the
    kernel in the Pallas interpreter (tests)."""
    from functools import partial

    from ..parallel.kernel_mesh import batch_shard_mapped

    interpret = jax.default_backend() != "tpu"
    return batch_shard_mapped(
        partial(gru_sequence, interpret=interpret),
        xp, w_hh, b_hh,
        batch_dims=(2, None, None),
        out_batch_dims=2,
        tile=16,
    )


def _projection_3d(x3, w, bias, *, interpret):
    """[B,L,F] @ [F,N] + bias on the tiled Pallas matmul (flat [B*L, F]
    GEMM — the layout the kernel was tuned at)."""
    from ..ops.pallas.matmul import projection_matmul

    b, l, f = x3.shape
    y = projection_matmul(x3.reshape(b * l, f), w, bias, interpret)
    return y.reshape(b, l, -1)


def _projection_sharded(x3, w, bias):
    """Layer input projection on the shared batch-sharded kernel path:
    each device runs the tiled matmul on its local batch shard (rows pad
    per shard inside the kernel wrapper), weights/bias enter replicated
    and their cotangents are psummed by shard_map's transpose. Returns
    None when a multi-device mesh can't map the batch — the caller falls
    back to the XLA einsum twin."""
    from functools import partial

    from ..parallel.kernel_mesh import batch_shard_mapped

    interpret = jax.default_backend() != "tpu"
    return batch_shard_mapped(
        partial(_projection_3d, interpret=interpret),
        x3, w, bias,
        batch_dims=(0, None, None),
        out_batch_dims=0,
    )


def _fused_frontend_sharded(x, day_w, day_b, day_idx, *, kernel_size, sigma):
    """Inference frontend kernel on the shared batch-sharded kernel path
    (one program per batch row — no batch tile). Returns None on a
    multi-device run whose mesh can't map the batch — the caller falls
    back to the unfused XLA frontend chain."""
    from functools import partial

    from ..ops.pallas.frontend_kernel import fused_frontend
    from ..parallel.kernel_mesh import batch_shard_mapped

    interpret = jax.default_backend() != "tpu"
    fn = partial(
        fused_frontend, kernel_size=kernel_size, sigma=sigma,
        interpret=interpret,
    )
    return batch_shard_mapped(
        fn, x, day_w, day_b, day_idx,
        batch_dims=(0, None, None, 0),
        out_batch_dims=0,
    )


def gru_encode(
    params: Params,
    cfg: GRUConfig,
    x: jax.Array,
    *,
    train: bool = False,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """Run the stacked GRU over pre-frontend features.

    Args:
      x: ``[B, T, C]`` smoothed/calibrated features (post day-affine +
        Softsign). The unfold is fused into layer 0's projection.

    Returns: ``[B, L, H·dirs]`` encoder states, L = (T-k)//s + 1.
    """
    b = x.shape[0]
    h = cfg.hidden_dim
    d = cfg.num_dirs
    layers = params["gru"]["layers"]
    cdt = cfg.compute_dtype

    out = x.astype(cdt)
    for li, lp in enumerate(layers):
        # Input projections for all directions as ONE [M, K] x [K, 3H*D]
        # matmul (concat directions on the output axis). The per-direction
        # einsum form ("blf,dfk->bldk") lowers to a batched matmul that runs
        # at ~36% of MXU peak on v5e; the flat form hits ~75% — measured
        # 10.7 -> ~5 ms fwd+bwd per layer at reference scale.
        w_cat = jnp.concatenate(
            [lp["w_ih"][i].astype(cdt) for i in range(d)], axis=-1
        )
        xp = None
        use_mm = cfg.use_pallas_matmul
        if use_mm is None:
            # Auto default: OFF. Round 3 flipped this on from isolated GEMM
            # wins; the round-4 full-step A/B (exp_matmul_fullstep_ab.py,
            # same chip, interleaved) measured 517 seq/s off vs 441 on —
            # the custom-call boundary costs more than the kernel saves.
            use_mm = False
        elif use_mm and li > 0 and not _mm_viable(b, out.shape[-1], 3 * h * d):
            # li > 0: layer 0 never takes the kernel path (it runs the
            # strided-conv input projection), so its raw channel count
            # (rarely a 128-multiple) must not trip a misleading warning.
            # A forced flag must not bypass the kernel's tiling contract
            # (K/N % 128) — projection_matmul raises deep inside otherwise.
            # Fall back to the einsum twin with a one-time warning.
            global _warned_matmul_fallback
            if not _warned_matmul_fallback:
                _warned_matmul_fallback = True
                import warnings

                warnings.warn(
                    f"use_pallas_matmul=True forced but layer-{li} GEMM "
                    f"dims (K={out.shape[-1]}, N={3 * h * d}) are not "
                    f"multiples of 128; using the XLA einsum instead.",
                    stacklevel=2,
                )
            use_mm = False
        if li > 0 and use_mm:
            # Hand-tiled Pallas GEMM (fwd + dX + dW), bias fused into the
            # f32 epilogue. None = unmappable multi-device mesh → XLA
            # einsum twin below. Layer 0 keeps the strided-conv unfold
            # (measured: XLA's conv lowering wins — BASELINE.md).
            b_cat = jnp.concatenate(
                [lp["b_ih"][i] for i in range(d)], axis=-1
            ).astype(jnp.float32)
            xp = _projection_sharded(out, w_cat, b_cat)
            if xp is not None:
                xp = xp.reshape(b, -1, d, 3 * h)
        if xp is None:
            if li == 0:
                # Layer 0 additionally fuses the unfold: strided conv
                # [B,T,C] ⊛ [k,C,3H*D] instead of materializing [B,L,C*k].
                xp = unfold_matmul(out, w_cat, cfg.kernel_len, cfg.stride_len)
            else:
                xp = jnp.einsum(
                    "blf,fk->blk", out, w_cat,
                    preferred_element_type=jnp.float32,
                )
            xp = xp.reshape(b, -1, d, 3 * h)
            xp = (xp + lp["b_ih"][None, None, :, :]).astype(cdt)
        xp = jnp.transpose(xp, (1, 2, 0, 3))  # [L, D, B, 3H]
        use_pallas = cfg.use_pallas
        if use_pallas is None:
            use_pallas = _pallas_scan_gate(
                jax.default_backend(), h, b, jax.device_count()
            )
        ys = None
        if use_pallas:
            # Direction 1's time reversal happens inside the kernel's block
            # index maps — no flip copies on either side. None = unmappable
            # multi-device mesh → XLA twin below.
            ys = _gru_sequence_sharded(xp, lp["w_hh"], lp["b_hh"])  # [L,D,B,H]
        if ys is None:
            if d == 2:
                xp = xp.at[:, 1].set(jnp.flip(xp[:, 1], axis=0))
            h0 = jnp.zeros((d, b, h), xp.dtype)
            ys = _gru_layer(xp, lp["w_hh"], lp["b_hh"], h0)  # [L, D, B, H]
            if d == 2:
                ys = ys.at[:, 1].set(jnp.flip(ys[:, 1], axis=0))
        out = jnp.transpose(ys, (2, 0, 1, 3)).reshape(b, ys.shape[0], d * h)
        if train and cfg.dropout > 0 and li < cfg.num_layers - 1:
            assert dropout_key is not None
            dk = jax.random.fold_in(dropout_key, li)
            keep = jax.random.bernoulli(dk, 1.0 - cfg.dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - cfg.dropout), 0.0)
    return out


def gru_forward(
    params: Params,
    cfg: GRUConfig,
    x: jax.Array,
    day_idx: jax.Array,
    *,
    train: bool = False,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """Full forward pass: ``[B, T, C]`` features -> ``[B, L, n_classes+1]``
    logits (float32). Mirrors ``GRUDecoder.forward`` (model.py:83-123)."""
    x = x.astype(cfg.compute_dtype)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = _pallas_scan_gate(
            jax.default_backend(), cfg.hidden_dim, x.shape[0],
            jax.device_count(),
        )
    fused_front = None
    if (use_pallas and not train and cfg.neural_dim % 128 == 0
            and cfg.gaussian_smooth_width > 0):
        # (sigma<=0 keeps the XLA chain: gaussian_smooth is a no-op there,
        # while Gaussian taps would be 0/0 = NaN)
        # Inference: one fused kernel pass (smooth+affine+softsign). The
        # training path keeps the XLA chain for its autodiff. None =
        # unmappable multi-device mesh → unfused XLA chain below.
        fused_front = _fused_frontend_sharded(
            x,
            params["day"]["weight"],
            params["day"]["bias"],
            day_idx,
            kernel_size=cfg.gaussian_kernel_size,
            sigma=cfg.gaussian_smooth_width,
        )
    if fused_front is not None:
        x = fused_front
    else:
        x = gaussian_smooth(
            x, cfg.gaussian_kernel_size, cfg.gaussian_smooth_width
        )
        x = day_affine(params["day"], x, day_idx)
        x = jax.nn.soft_sign(x)
    enc = gru_encode(params, cfg, x, train=train, dropout_key=dropout_key)
    return (
        jnp.einsum("blh,hk->blk", enc, params["fc"]["weight"].astype(enc.dtype),
                   preferred_element_type=jnp.float32)
        + params["fc"]["bias"].astype(jnp.float32)
    )


def gru_output_length(cfg: GRUConfig, t: int) -> int:
    return unfold_output_length(t, cfg.kernel_len, cfg.stride_len)
