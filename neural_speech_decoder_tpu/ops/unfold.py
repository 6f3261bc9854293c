"""Temporal unfold (overlapping-window extraction) and its fused form.

The reference extracts overlapping windows with ``nn.Unfold((kernelLen, 1),
stride=strideLen)`` producing ``[B, L, C*k]`` frames whose feature layout is
channel-major: ``frame[l, c*k + j] = x[l*stride + j, c]`` (``model.py:37-39,
96-101``).  ``L = floor((T - k)/stride) + 1``.

The CTC *length accounting* in the reference trainer however uses
``(T_valid - k) // stride`` (``neural_decoder_trainer.py:209``) — one frame
fewer than the unfold actually yields when ``(T_valid - k) % stride == 0``.
We reproduce the reference's reported-length formula (``ctc_input_lengths``)
while computing the full unfold, exactly as the reference does.

TPU design: materializing ``[B, L, 256*32]`` costs 8× the input bandwidth;
on the hot path the unfold is *never materialized* — the subsequent input
projection (GRU layer-0 ``W_ih`` or any dense on the unfolded frames) is
algebraically a strided conv with kernel ``[k, C, out]`` and runs on the MXU
directly from the ``[B, T, C]`` activations (see ``unfold_matmul``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unfold_output_length(t: int, kernel: int, stride: int) -> int:
    """Frames actually produced by the unfold: floor((T-k)/s) + 1."""
    return (t - kernel) // stride + 1


def ctc_input_lengths(x_lens: jax.Array, kernel: int, stride: int) -> jax.Array:
    """Reference CTC-input-length formula ``(len - k) / s`` truncated
    toward zero, clamped at 0.

    Matches ``neural_decoder_trainer.py:209`` (``((X_len - kernelLen) /
    strideLen).to(torch.int32)`` — float division then truncation toward
    zero, NOT floor: a sub-kernel utterance gives e.g. -2, where floor
    division would give -3). The lower clamp to 0 is beyond-reference
    robustness — a negative length reaching ``ctc_loss`` would produce
    undefined values (torch CTC would crash in the reference instead).
    """
    diff = x_lens.astype(jnp.int32) - kernel
    out = jnp.where(diff >= 0, diff // stride, -((-diff) // stride))
    return jnp.maximum(out, 0)


def unfold(x: jax.Array, kernel: int, stride: int) -> jax.Array:
    """Materialized unfold, torch-layout compatible. ``[B,T,C] -> [B,L,C*k]``.

    Used only in tests / cold paths; hot paths use ``unfold_matmul``.
    """
    b, t, c = x.shape
    l = unfold_output_length(t, kernel, stride)
    starts = jnp.arange(l) * stride
    # windows: [B, L, k, C]
    idx = starts[:, None] + jnp.arange(kernel)[None, :]
    windows = x[:, idx, :]
    # torch nn.Unfold flattens channel-major: feature = c*k + j.
    windows = jnp.transpose(windows, (0, 1, 3, 2))  # [B, L, C, k]
    return windows.reshape(b, l, c * kernel)


def unfold_matmul(
    x: jax.Array,
    weight: jax.Array,
    kernel: int,
    stride: int,
    *,
    precision=None,
) -> jax.Array:
    """Fused ``unfold(x) @ weight`` without materializing the unfold.

    Args:
      x: ``[B, T, C]``.
      weight: ``[C*k, O]`` in torch-unfold feature layout (row ``c*k + j``).

    Returns: ``[B, L, O]`` — identical to ``unfold(x) @ weight``.

    Implementation: a strided conv with kernel ``K[j, c, o] = weight[c*k+j, o]``
    computes ``out[b,l,o] = Σ_{j,c} x[b, l*s+j, c] · K[j,c,o]``, which XLA
    lowers to MXU matmuls over the contraction dim ``k*C``.
    """
    c = x.shape[-1]
    o = weight.shape[-1]
    k_conv = weight.reshape(c, kernel, o).transpose(1, 0, 2)  # [k, C, O]
    # Output dtype follows x: the TPU conv accumulates in f32 on the MXU
    # internally even for bf16 operands, and a uniform dtype keeps the VJP
    # convs (which swap operands/cotangents) well-typed.
    return jax.lax.conv_general_dilated(
        x,
        k_conv.astype(x.dtype),
        window_strides=(stride,),
        padding=[(0, 0)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        precision=precision,
    )
