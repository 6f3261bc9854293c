"""Conformer CTC encoder — the framework's second model family.

Capability parity with the reference ``NeuralTransformerCTCModel``
(``transformer_ctc.py:333-501``): per-day affine → NeuralFrontend (9-tap
Gaussian smooth, depthwise strided conv k=32/s=4, linear projection + LN +
dropout) → MLP bottleneck → SpecAugment (train) → sinusoidal positional
encoding → N ConformerBlocks (half-step FFs, MHSA with key-padding mask,
depthwise conv module, DropPath) → deep classification head, with an
intermediate CTC tap at layer N/2 during training.

TPU-first notes:
  * everything is batch-first ``[B, T, D]`` with static shapes; the padding
    mask is positions ≥ out_len, identical to the reference's
    ``key_padding_mask`` construction (``transformer_ctc.py:479-483``);
  * attention uses a large-negative additive mask (exactly 0 attention after
    softmax underflow for valid rows) instead of -inf so fully-padded rows
    degrade to uniform attention rather than NaN — reference behavior for
    valid rows, NaN-free for padding rows;
  * dropout/drop-path/SpecAugment are explicit-key functional transforms;
  * matmuls run in bf16-friendly einsums with f32 accumulation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.day_affine import day_affine, init_day_affine
from ..ops.gaussian import conformer_kernel_size, gaussian_smooth
from ..ops.specaugment import spec_augment
from .common import torch_linear_init, xavier_uniform

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    n_channels: int = 256
    n_classes: int = 40  # excl. blank
    n_days: int = 24
    frontend_dim: int = 1024
    latent_dim: int = 1024
    autoencoder_hidden_dim: int = 512
    num_layers: int = 8
    num_heads: int = 8
    ff_dim: int = 2048
    dropout: float = 0.3
    temporal_kernel: int = 32
    temporal_stride: int = 4
    gaussian_smooth_width: float = 2.0
    conv_kernel: int = 31
    use_spec_augment: bool = True
    spec_augment_freq_mask: int = 100
    spec_augment_time_mask: int = 40
    drop_path_prob: float = 0.1
    head_dropout: float = 0.3  # deep head (transformer_ctc.py:423)
    max_pos_len: int = 5000
    # Fused Pallas MHSA (scores→mask→softmax→dropout→@V in VMEM, custom
    # VJP) on the TPU bf16 fast path; fp32 keeps the naive einsum path for
    # exact torch parity. See ops/pallas/attention_kernel.py.
    # True = auto-gate (backend/dtype/VMEM, and on multi-device a
    # registered kernel mesh — see parallel/kernel_mesh.py); False = off;
    # "force" = always use the kernel when shapes allow, in interpreter
    # mode off-TPU (multi-device CPU tests).
    fused_attention: bool | str = True
    # Fused Pallas FF module (LN→lin1→SiLU→dropout→lin2→dropout per batch
    # row in VMEM, weights grid-resident, custom VJP) — measured-NO-GAIN
    # experiment, default OFF: isolated it beats the XLA twin (3.97 vs
    # 4.91 ms fwd+bwd at reference scale) but in the full train step XLA
    # fuses the FF glue into neighboring ops and the kernel boundary
    # blocks those fusions (158→168 ms/step B=64; worse at B=128 —
    # BASELINE.md "Fused-FFN experiment"). Unlike the MHSA kernel there
    # is no quadratic HBM intermediate to eliminate here. Opt-in True =
    # auto-gate like fused_attention (multi-device: batch-mapped
    # shard_map; TP meshes fall back — the FFN weights are sharded
    # there); "force" = kernel in interpreter mode off-TPU (tests).
    # See ops/pallas/ffn_kernel.py.
    fused_ffn: bool | str = False
    # Fused conv-module kernel (ops/pallas/conv_module_kernel.py) —
    # round-5 experiment settling the conv-module question with a
    # measured full-step A/B instead of the round-3 corollary
    # (BASELINE.md "Fused conv-module experiment"). Opt-in True = auto
    # gate; "force" = interpreter mode off-TPU (tests). Single-device
    # only (multi-device falls back to the XLA twin).
    fused_conv: bool | str = False
    # Head-parallel tensor parallelism: when True, in_proj_w/in_proj_b use
    # the per-head-interleaved column order (head, {q,k,v}, dh) instead of
    # torch's ({q,k,v}, head, dh), so sharding the last weight axis over a
    # 'model' mesh axis keeps whole heads local — MHSA runs with zero
    # collectives until the row-parallel out projection's psum. Pure
    # column permutation: single-device numerics are bit-identical.
    # Enabled automatically by the trainer under n_model_devices > 1
    # (parallel/shardings.py::interleave_attention_params relays the
    # canonically-initialized weights).
    qkv_interleaved: bool = False
    # Streaming-capable causal variant: banded self-attention (each frame
    # attends to itself and at most ``attn_left_context`` past frames) and
    # left-padded (causal) depthwise conv modules. The offline causal
    # forward is exactly reproduced chunk-by-chunk by
    # ``streaming.conformer.ConformerStreamer`` with carried KV/conv
    # caches — the Conformer analog of the unidirectional-GRU streaming
    # mode (SURVEY.md §5; the bidirectional default cannot stream).
    causal: bool = False
    attn_left_context: int = 128
    dtype: Any = jnp.float32  # parameter dtype
    # Activation/matmul dtype (bf16 on the MXU with f32 accumulation and f32
    # norm/softmax statistics); float32 keeps exact torch parity for tests.
    compute_dtype: Any = jnp.float32

    @property
    def n_out(self) -> int:
        return self.n_classes + 1

    @property
    def use_interctc(self) -> bool:
        return self.num_layers >= 6  # transformer_ctc.py:411

    @property
    def interctc_layer(self) -> int:
        return self.num_layers // 2


def _init_ln(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)  # stats in f32 under mixed precision
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _init_linear(key, din, dout, dtype):
    w, b = torch_linear_init(key, din, dout, dtype)
    return {"w": w, "b": b}


def _linear(p, x):
    # Weights cast to the activation dtype so bf16 activations drive a bf16
    # MXU matmul (f32 otherwise wins type promotion) with f32 accumulation.
    y = jnp.einsum(
        "...d,dk->...k", x, p["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _init_ff(key, d, ff, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "ln": _init_ln(d, dtype),
        "lin1": _init_linear(k1, d, ff, dtype),
        "lin2": _init_linear(k2, ff, d, dtype),
    }


def _init_attn(key, d, dtype):
    kq, ko = jax.random.split(key)
    return {
        "ln": _init_ln(d, dtype),
        # torch MHA: xavier in_proj, zero biases (in_proj + out_proj).
        "in_proj_w": xavier_uniform(kq, (d, 3 * d), dtype, fan_in=d, fan_out=3 * d),
        "in_proj_b": jnp.zeros((3 * d,), dtype),
        "out": {
            "w": torch_linear_init(ko, d, d, dtype)[0],
            "b": jnp.zeros((d,), dtype),
        },
    }


def _init_conv_module(key, d, kernel, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(kernel)  # torch depthwise Conv1d default init
    return {
        "ln": _init_ln(d, dtype),
        "pw1": _init_linear(k1, d, 2 * d, dtype),
        "dw_w": jax.random.uniform(k2, (kernel, d), dtype, -bound, bound),
        "dw_b": jax.random.uniform(k3, (d,), dtype, -bound, bound),
        "ln_conv": _init_ln(d, dtype),
        "pw2": _init_linear(k4, d, d, dtype),
    }


def _init_block(key, cfg: ConformerConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d = cfg.latent_dim
    return {
        "ff1": _init_ff(k1, d, cfg.ff_dim, cfg.dtype),
        "attn": _init_attn(k2, d, cfg.dtype),
        "conv": _init_conv_module(k3, d, cfg.conv_kernel, cfg.dtype),
        "ff2": _init_ff(k4, d, cfg.ff_dim, cfg.dtype),
        "ln_final": _init_ln(d, cfg.dtype),
    }


def init_conformer_params(key: jax.Array, *, cfg: ConformerConfig) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 6)
    c, f, d = cfg.n_channels, cfg.frontend_dim, cfg.latent_dim
    params: Params = {
        "day": init_day_affine(cfg.n_days, c, cfg.dtype),
        "frontend": {
            # depthwise strided conv, constant 1/k init, no bias
            # (transformer_ctc.py:81-90)
            "tconv_w": jnp.full(
                (cfg.temporal_kernel, c), 1.0 / cfg.temporal_kernel, cfg.dtype
            ),
            "proj": _init_linear(keys[0], c, f, cfg.dtype),
            "ln": _init_ln(f, cfg.dtype),
        },
        "bottleneck": {
            "lin1": _init_linear(keys[1], f, cfg.autoencoder_hidden_dim, cfg.dtype),
            "lin2": _init_linear(keys[2], cfg.autoencoder_hidden_dim, d, cfg.dtype),
        },
        "blocks": [
            _init_block(keys[3 + i], cfg) for i in range(cfg.num_layers)
        ],
        "head": {
            "lin1": _init_linear(keys[-3], d, d, cfg.dtype),
            "ln": _init_ln(d, cfg.dtype),
            "lin2": _init_linear(keys[-2], d, cfg.n_out, cfg.dtype),
        },
    }
    if cfg.use_interctc:
        params["inter_out"] = _init_linear(keys[-1], d, cfg.n_out, cfg.dtype)
    return params


def sinusoidal_pos_encoding(max_len: int, d_model: int, dtype=jnp.float32):
    """Standard sinusoidal table (transformer_ctc.py:315-323)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div)
    # odd d_model: the cos track has one fewer column than div
    pe[:, 1::2] = np.cos(position * div[: d_model // 2])
    return jnp.asarray(pe, dtype)


def sinusoidal_pos_rows(offset, n: int, d_model: int, dtype=jnp.float32):
    """Rows ``[offset, offset+n)`` of the sinusoidal encoding, computed on
    the fly (``offset`` may be a traced scalar).

    The closed form needs no table, so a stream's positional encoding has
    NO length cap — the offline ``max_pos_len`` table bound does not apply
    to streaming sessions (values match ``sinusoidal_pos_encoding`` to
    float32 round-off; positions stay exact up to 2^24 frames ≈ 15 days of
    80 ms chunks, far past any physical session).
    """
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    pos = (
        jnp.asarray(offset, jnp.float32) + jnp.arange(n, dtype=jnp.float32)
    )[:, None]
    pe = jnp.zeros((n, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: d_model // 2]))
    return pe.astype(dtype)


def _dropout(key, x, rate, train):
    # Counter-hash dropout (ops/hashrng.py): same distribution as
    # jax.random.bernoulli but the mask fuses into the consumer — saves
    # ~18 ms/step of standalone RNG kernels at reference scale (B=64).
    from ..ops.hashrng import hash_dropout

    return hash_dropout(key, x, rate, train)


def _drop_path(key, x, prob, train):
    """Per-sample stochastic depth (transformer_ctc.py:9-23)."""
    if not train or prob <= 0:
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(key, 1.0 - prob, shape)
    return jnp.where(keep, x / (1.0 - prob), 0.0)


def _ff_module(p, x, key, dropout, train, cfg=None):
    if cfg is not None and _use_fused_ffn(cfg, x.shape[1], x.shape[0]):
        out = _fused_ffn_sharded(
            cfg, p, x, key,
            dropout_rate=dropout if key is not None else 0.0,
            train=train and key is not None,
        )
        if out is not None:
            return out
    k1, k2 = (jax.random.split(key) if key is not None else (None, None))
    h = _linear(p["lin1"], _layer_norm(p["ln"], x))
    h = jax.nn.silu(h)
    h = _dropout(k1, h, dropout, train)
    h = _linear(p["lin2"], h)
    return _dropout(k2, h, dropout, train)


def _use_fused_ffn(cfg: ConformerConfig, t: int, b: int) -> bool:
    """Gate for the fused FF kernel (ops/pallas/ffn_kernel.py) — same
    scheme as ``_use_fused_attention``: shape/VMEM gates always apply;
    "force" runs the kernel in interpreter mode off-TPU (tests); the
    auto mode requires bf16 on a TPU backend and, multi-device, a
    batch-mappable registered kernel mesh (TP meshes shard the FFN
    weights, so they use the einsum twin)."""
    from ..parallel.kernel_mesh import batch_mappable_mesh

    d, f = cfg.latent_dim, cfg.ff_dim
    # bwd VMEM: bf16 weights + f32 dW grid-resident buffers + ~4 [T,F]
    # f32 intermediates per program (see ffn_kernel._vmem_params)
    vmem_est = 2 * d * f * 2 + 2 * d * f * 4 + 4 * t * f * 4
    shapes_ok = d % 128 == 0 and f % 128 == 0 and vmem_est <= (100 << 20)
    gate = _fused_gate(cfg.fused_ffn, shapes_ok, cfg)
    if gate is not None:
        return gate
    return batch_mappable_mesh(b) is not None


def _fused_ffn_sharded(cfg, p, x, key, *, dropout_rate, train):
    """Fused FF kernel with multi-device support (batch-mapped shard_map
    over the registered kernel mesh; weights replicated — their
    cotangents psum over the manual axes). Single device calls the
    kernel directly (interpreter off-TPU, for tests). Returns None when
    a multi-device mesh doesn't map cleanly — the caller falls back to
    the einsum twin."""
    from functools import partial

    from ..ops.pallas.ffn_kernel import fused_ffn
    from ..parallel.kernel_mesh import batch_shard_mapped

    interpret = jax.default_backend() != "tpu"
    call = partial(
        fused_ffn, dropout_rate=dropout_rate, train=train,
        interpret=interpret,
    )
    args = (
        p["ln"]["scale"], p["ln"]["bias"],
        p["lin1"]["w"], p["lin1"]["b"],
        p["lin2"]["w"], p["lin2"]["b"],
    )
    dropout_on = train and key is not None and dropout_rate > 0.0
    if key is None:
        key = jax.random.key(0)  # unused (dropout_on False); shard_map
        # needs a concrete array operand, not None
    return batch_shard_mapped(
        lambda x, key, *w: call(x, *w, key),
        x, key, *args,
        batch_dims=(0, None) + (None,) * len(args),
        out_batch_dims=0,
        # per-shard dropout streams restart the in-kernel program-id
        # counter at 0; fold the key with the shard index to decorrelate
        fold_rng_arg=1 if dropout_on else None,
    )


def _fused_gate(flag, shapes_ok: bool, cfg: "ConformerConfig"):
    """Shared gating ladder for the fused-kernel config flags
    (``fused_attention`` / ``fused_ffn``): returns True/False when the
    decision is final, or None when the caller must apply its own
    multi-device mesh predicate. "force" obeys only the shape gates
    (kernel runs in interpreter mode off-TPU — tests); auto mode
    requires bf16 compute on a TPU backend."""
    if flag == "force":
        return shapes_ok
    if not (
        flag
        and shapes_ok
        and cfg.compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    ):
        return False
    if jax.device_count() == 1:
        return True
    return None  # multi-device: caller's mesh predicate decides


def _use_fused_attention(cfg: ConformerConfig, t: int, b: int) -> bool:
    dh = cfg.latent_dim // cfg.num_heads
    # VMEM budget gate: the kernel keeps a full [Tp, Tp] f32 score matrix
    # (plus q/k/v/out [Tp, dh] blocks) per (batch, head) program; the
    # backward rematerializes a second [Tp, Tp]. Past ~2k frames that
    # exceeds Mosaic's 16 MB scoped-VMEM default and the compile fails
    # instead of falling back — so gate on padded T and use the einsum
    # path for very long sequences (max_pos_len allows 5000).
    from ..ops.pallas.attention_kernel import _pad_t
    from ..parallel.kernel_mesh import get_kernel_mesh

    tp = _pad_t(t)
    vmem_est = 2 * tp * tp * 4 + 4 * tp * dh * 4
    shapes_ok = dh % 128 == 0 and vmem_est <= (12 << 20)
    gate = _fused_gate(cfg.fused_attention, shapes_ok, cfg)
    if gate is not None:
        return gate
    # Multi-chip: a bare Mosaic custom call has no GSPMD partitioning rule
    # (XLA would all-gather + replicate it), so the kernel path needs a
    # registered kernel mesh to shard_map over — batch over the mesh's
    # batch axis, and (for the qkv_interleaved TP layout) heads over the
    # model axis. The shard_map region is fully manual (JAX 0.9:
    # partial-manual needs vma metadata Pallas out-shapes don't carry),
    # so the mapped axes must cover ALL mesh devices and shapes must
    # split evenly across the shards.
    km = get_kernel_mesh()
    if km is None or km.n_devices <= 1 or b % km.batch_shards != 0:
        return False
    if cfg.qkv_interleaved and km.model_shards > 1:
        return (
            cfg.num_heads % km.model_shards == 0
            and km.batch_shards * km.model_shards == km.n_devices
        )
    return km.batch_shards == km.n_devices


def _fused_mhsa_sharded(cfg, qkv, lens, key, *, dropout_rate, train):
    """Fused Pallas MHSA with multi-device support.

    ``qkv`` is the projection output [B, T, 3D] in the layout selected by
    ``cfg.qkv_interleaved`` — the kernel consumes it directly (BlockSpec
    column maps) and returns the head-major context [B, T, D]; no
    head-split transposes exist on this path.

    Single device: plain ``fused_mhsa_qkv`` call (Pallas interpreter
    off-TPU, for tests). Multi-device with a registered kernel mesh
    (parallel/kernel_mesh.py): the kernel runs inside ``shard_map`` —
    batch over the mesh's batch axis, and, for the ``qkv_interleaved``
    tensor-parallel layout, heads over the model axis (the interleaved
    column order puts whole heads on each 'model' shard, so the local
    array is itself a valid interleaved qkv with ``H / model_shards``
    heads — attention runs collective-free, composing with the
    row-parallel out projection exactly like the einsum TP path). The
    in-kernel dropout counter is seeded per (batch, head) *program id*,
    which restarts at 0 on every shard — so the key is folded with the
    shard index inside the manual region to decorrelate masks across
    shards. The region is fully manual with ``check_vma=False`` (JAX
    0.9: partial-manual requires vma metadata Pallas out-shapes don't
    carry), so the mapped axes must cover all mesh devices — enforced by
    ``_use_fused_attention`` and re-checked here for the "force" path.
    Returns **None** on a multi-device run whose mesh doesn't map cleanly
    (e.g. a forced run on a TP mesh with replicated heads, or no mesh
    registered at all) — the caller falls back to the einsum twin, which
    GSPMD partitions cleanly; a bare replicated kernel would be strictly
    worse."""
    from functools import partial

    from ..ops.pallas.attention_kernel import fused_mhsa_qkv
    from ..parallel.kernel_mesh import get_kernel_mesh

    interpret = jax.default_backend() != "tpu"
    left = cfg.attn_left_context if cfg.causal else None
    call = partial(
        fused_mhsa_qkv, dropout_rate=dropout_rate, train=train,
        interpret=interpret, left_context=left,
        interleaved=cfg.qkv_interleaved,
    )
    b, t, _ = qkv.shape
    if jax.device_count() <= 1:
        return call(qkv, lens, key, num_heads=cfg.num_heads)
    km = get_kernel_mesh()
    if km is None or km.n_devices <= 1:
        return None

    from jax.sharding import PartitionSpec as P

    head_tp = cfg.qkv_interleaved and km.model_shards > 1
    mapped = km.batch_shards * (km.model_shards if head_tp else 1)
    if (
        mapped != km.n_devices
        or b % km.batch_shards != 0
        or (head_tp and cfg.num_heads % km.model_shards != 0)
    ):
        return None
    local_heads = cfg.num_heads // (km.model_shards if head_tp else 1)
    qkv_spec = P(km.batch_axis, None, km.model_axis if head_tp else None)
    out_spec = P(km.batch_axis, None, km.model_axis if head_tp else None)
    if lens is None:
        lens = jnp.full((b,), t, jnp.int32)
    dropout_on = train and key is not None and dropout_rate > 0.0

    def inner(qkv, lens, key):
        if dropout_on:
            idx = jax.lax.axis_index(km.batch_axis)
            if head_tp:
                idx = idx * km.model_shards + jax.lax.axis_index(
                    km.model_axis
                )
            key = jax.random.fold_in(key, idx)
        return call(qkv, lens, key, num_heads=local_heads)

    if key is None:
        key = jax.random.key(0)  # unused (dropout_on False); shard_map
        # needs a concrete array operand, not None
    return jax.shard_map(
        inner,
        mesh=km.mesh,
        in_specs=(qkv_spec, P(km.batch_axis), P()),
        out_specs=out_spec,
        check_vma=False,
    )(qkv, lens, key)


def _attention(p, cfg, x, pad_mask, out_lens, key, train):
    """MHSA with key-padding mask (torch nn.MultiheadAttention semantics).

    bf16 on TPU routes through the fused Pallas kernel (identical math:
    same mask constant, f32 softmax, in-kernel prob dropout); fp32 keeps
    the einsum path as the torch-parity oracle.
    """
    num_heads, dropout = cfg.num_heads, cfg.dropout
    b, t, d = x.shape
    dh = d // num_heads
    xn = _layer_norm(p["ln"], x)
    qkv = (
        jnp.einsum("btd,dk->btk", xn, p["in_proj_w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
        + p["in_proj_b"].astype(jnp.float32)
    ).astype(x.dtype)
    out2d = None
    if _use_fused_attention(cfg, t, b):
        # The kernel consumes the projection output layout directly and
        # returns the head-major [B, T, D] context — no head-split
        # transposes on this path. None = unmappable multi-device mesh →
        # einsum twin below.
        out2d = _fused_mhsa_sharded(
            cfg, qkv, out_lens, key,
            dropout_rate=dropout if key is not None else 0.0,
            train=train and key is not None,
        )
    if out2d is None:
        if cfg.qkv_interleaved:
            # TP layout (see ConformerConfig.qkv_interleaved): the
            # (divisible) reshape keeps the 'model'-sharded axis on heads
            # — no resharding.
            z = qkv.reshape(b, t, num_heads, 3, dh)
            q, k, v = (z[:, :, :, i].transpose(0, 2, 1, 3) for i in range(3))
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(z):
                return z.reshape(b, t, num_heads, dh).transpose(0, 2, 1, 3)

            q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
        if pad_mask is not None:  # pad_mask: [B, T] True = padding
            scores = jnp.where(pad_mask[:, None, None, :], -1e9, scores)
        if cfg.causal:
            # banded mask: query i sees keys in [i - left_context, i]
            qi = jnp.arange(t)[:, None]
            kj = jnp.arange(t)[None, :]
            band = (kj <= qi) & (qi - kj <= cfg.attn_left_context)
            scores = jnp.where(band[None, None, :, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        if key is not None:
            probs = _dropout(key, probs, dropout, train)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out2d = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return _linear(p["out"], out2d)


def _use_fused_conv(cfg: "ConformerConfig", t: int, b: int) -> bool:
    """Gate for the fused conv-module kernel — same ladder as
    ``_use_fused_ffn`` but single-device only (the experiment doesn't
    carry a shard_map wrapper)."""
    d = cfg.latent_dim
    kw = cfg.conv_kernel
    # bwd VMEM: pw weights + dW accumulators + several [T, 2D] f32 blocks
    vmem_est = 3 * d * d * 2 + (3 * d * d + kw * d) * 4 + 6 * t * 2 * d * 4
    shapes_ok = d % 128 == 0 and kw % 2 == 1 and vmem_est <= (110 << 20)
    gate = _fused_gate(cfg.fused_conv, shapes_ok, cfg)
    return bool(gate) if gate is not None else False


def _conv_module(p, x, key, dropout, train, causal=False, cfg=None):
    """Conformer conv module incl. residual (transformer_ctc.py:148-191).

    ``causal=True`` left-pads the depthwise conv (k-1, 0) so each output
    frame depends only on past/current frames (streaming mode)."""
    if cfg is not None and _use_fused_conv(cfg, x.shape[1], x.shape[0]):
        from ..ops.pallas.conv_module_kernel import fused_conv_module

        h = fused_conv_module(
            x, p["ln"]["scale"], p["ln"]["bias"], p["pw1"]["w"],
            p["pw1"]["b"], p["dw_w"], p["dw_b"], p["ln_conv"]["scale"],
            p["ln_conv"]["bias"], p["pw2"]["w"], p["pw2"]["b"],
            key,
            dropout_rate=dropout if key is not None else 0.0,
            train=train and key is not None,
            causal=causal,
            interpret=cfg.fused_conv == "force",
        )
        return x + h
    residual = x
    h = _layer_norm(p["ln"], x)
    h = _linear(p["pw1"], h)  # [B, T, 2D]
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # GLU
    # Depthwise conv along time; 'same' padding offline, causal when
    # streaming-compatible.
    kernel = p["dw_w"][:, None, :]  # [k, 1, D]
    kw = p["dw_w"].shape[0]
    pad = (kw - 1, 0) if causal else (kw // 2, kw // 2)
    h = (
        jax.lax.conv_general_dilated(
            h,
            kernel.astype(h.dtype),
            window_strides=(1,),
            padding=[pad],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=h.shape[-1],
        ).astype(jnp.float32)
        + p["dw_b"].astype(jnp.float32)
    ).astype(h.dtype)
    h = _layer_norm(p["ln_conv"], h)
    h = jax.nn.silu(h)
    h = _linear(p["pw2"], h)
    h = _dropout(key, h, dropout, train)
    return residual + h


def _block(p, cfg: ConformerConfig, x, pad_mask, out_lens, key, train):
    if key is not None:
        keys = jax.random.split(key, 8)
    else:
        keys = [None] * 8
    x = x + _drop_path(
        keys[0], 0.5 * _ff_module(p["ff1"], x, keys[1], cfg.dropout, train,
                          cfg),
        cfg.drop_path_prob, train,
    )
    attn = _attention(p["attn"], cfg, x, pad_mask, out_lens, keys[2], train)
    attn = _dropout(keys[3], attn, cfg.dropout, train)
    x = x + _drop_path(keys[4], attn, cfg.drop_path_prob, train)
    x = _conv_module(p["conv"], x, keys[5], cfg.dropout, train,
                     causal=cfg.causal, cfg=cfg)
    x = x + _drop_path(
        keys[6], 0.5 * _ff_module(p["ff2"], x, keys[7], cfg.dropout, train,
                          cfg),
        cfg.drop_path_prob, train,
    )
    return _layer_norm(p["ln_final"], x)


def conformer_frontend(params, cfg: ConformerConfig, x, key, train):
    """Gaussian smooth → depthwise strided conv → project/LN/dropout
    (transformer_ctc.py:105-128)."""
    if cfg.gaussian_smooth_width > 0:
        ks = conformer_kernel_size(cfg.gaussian_smooth_width)
        x = gaussian_smooth(
            x, ks, cfg.gaussian_smooth_width, padding=(ks // 2, ks // 2)
        )
    if cfg.temporal_kernel > 0:
        kernel = params["frontend"]["tconv_w"][:, None, :]  # [k, 1, C]
        x = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(cfg.temporal_stride,),
            padding=[(0, 0)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=x.shape[-1],
        )
    x = _linear(params["frontend"]["proj"], x)
    x = _layer_norm(params["frontend"]["ln"], x)
    return _dropout(key, x, cfg.dropout, train)


def conformer_output_lengths(cfg: ConformerConfig, x_lens, actual_len):
    """(len - k) / s truncated toward zero, clamped to [0, realized frame
    count] (transformer_ctc.py:431-440).

    Truncation toward zero (not floor) mirrors the reference's float-div-
    then-int-cast for sub-kernel utterances; the additional lower clamp to
    0 is beyond-reference robustness — a negative length reaching
    ``ctc_loss``/the pad mask would produce undefined values (the
    reference would crash in torch CTC instead)."""
    if cfg.temporal_kernel > 0 and cfg.temporal_stride > 1:
        diff = x_lens.astype(jnp.int32) - cfg.temporal_kernel
        s = cfg.temporal_stride
        out = jnp.where(diff >= 0, diff // s, -((-diff) // s))
    else:
        out = x_lens.astype(jnp.int32)
    return jnp.clip(out, 0, actual_len)


def conformer_forward(
    params: Params,
    cfg: ConformerConfig,
    x: jax.Array,
    day_idx: jax.Array,
    x_lens: jax.Array | None = None,
    *,
    train: bool = False,
    key: jax.Array | None = None,
):
    """Full forward (transformer_ctc.py:442-501), batch-first.

    Returns (log_probs [B, T', K], out_lens [B], inter_log_probs or None).
    """
    if train and key is None:
        raise ValueError("train=True requires an RNG key")
    keys = jax.random.split(key, cfg.num_layers + 4) if key is not None else None

    x = x.astype(cfg.compute_dtype)
    x = day_affine(params["day"], x, day_idx)
    z = conformer_frontend(
        params, cfg, x, keys[0] if keys is not None else None, train
    )
    z = _linear(params["bottleneck"]["lin2"],
                jax.nn.relu(_linear(params["bottleneck"]["lin1"], z)))
    if cfg.use_spec_augment and train:
        z = spec_augment(
            keys[1],
            z,
            freq_mask_param=cfg.spec_augment_freq_mask,
            time_mask_param=cfg.spec_augment_time_mask,
        )
    t_actual = z.shape[1]
    pe = sinusoidal_pos_encoding(cfg.max_pos_len, cfg.latent_dim, z.dtype)
    z = z + pe[:t_actual]

    if x_lens is not None:
        out_lens = conformer_output_lengths(cfg, x_lens, t_actual)
        pad_mask = jnp.arange(t_actual)[None, :] >= out_lens[:, None]
    else:
        out_lens = jnp.full((x.shape[0],), t_actual, jnp.int32)
        pad_mask = None

    inter_log_probs = None
    for i, bp in enumerate(params["blocks"]):
        bk = keys[3 + i] if keys is not None else None
        z = _block(bp, cfg, z, pad_mask,
                   out_lens if x_lens is not None else None, bk, train)
        if cfg.use_interctc and i == cfg.interctc_layer - 1 and train:
            inter_logits = _linear(params["inter_out"], z).astype(jnp.float32)
            inter_log_probs = jax.nn.log_softmax(inter_logits, axis=-1)

    h = _linear(params["head"]["lin1"], z)
    h = jax.nn.gelu(_layer_norm(params["head"]["ln"], h), approximate=False)
    h = _dropout(keys[2] if keys is not None else None, h, cfg.head_dropout, train)
    logits = _linear(params["head"]["lin2"], h).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1), out_lens, inter_log_probs
