"""Gaussian temporal smoothing as a depthwise 1-D convolution.

Reproduces the behavior of the reference's two Gaussian-smoothing variants:
  * GRU path  — ``GaussianSmoothing`` (reference ``augmentations.py:27-91``):
    a *density-valued* normalized kernel of fixed ``kernel_size=20`` taps,
    depthwise conv with torch ``padding="same"`` (asymmetric for even taps).
  * Conformer path — ``NeuralFrontend._make_gaussian_kernel`` (reference
    ``transformer_ctc.py:72-76,99-103``): ``kernel_size = int(4*sigma)+1``
    (odd) taps, symmetric padding ``kernel_size // 2``.

Both variants normalize the kernel to sum to one, so the tap values agree for
equal sizes; only the number of taps and the padding differ.

TPU note: a 20-tap depthwise conv over 256 channels is bandwidth-bound; XLA
fuses it well, and it is also folded into the fused Pallas frontend kernel
(``ops/pallas/frontend_kernel.py``) on the hot path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian taps, matching both reference constructions.

    The reference GRU path multiplies by the density constant
    ``1/(sigma*sqrt(2*pi))`` (``augmentations.py:54-60``) and the Conformer
    path does not (``transformer_ctc.py:99-103``); since both renormalize to
    sum 1, the resulting taps are identical for a given ``kernel_size``.
    """
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    k = k / k.sum()
    return k.astype(np.float32)


def same_padding(kernel_size: int) -> tuple[int, int]:
    """(left, right) padding replicating torch ``padding="same"`` for conv1d.

    torch pads ``total = k - 1`` with ``left = total // 2`` and the remainder
    on the right, so an even kernel (the GRU path's 20 taps) pads (9, 10).
    Verified against torch in ``tests/test_gaussian.py``.
    """
    total = kernel_size - 1
    left = total // 2
    return (left, total - left)


def gaussian_smooth(
    x: jax.Array,
    kernel_size: int,
    sigma: float,
    *,
    padding: tuple[int, int] | None = None,
) -> jax.Array:
    """Depthwise Gaussian smoothing along time.

    Args:
      x: ``[B, T, C]`` features (time-major layout is kept throughout this
        framework; the reference permutes to ``[B, C, T]`` for torch conv,
        ``model.py:84-86`` — unnecessary under XLA's layout freedom).
      kernel_size: number of taps (20 for the GRU path, ``int(4σ)+1`` for the
        Conformer path).
      sigma: Gaussian std in bins.
      padding: explicit (left, right); defaults to torch-"same" semantics.

    Returns:
      ``[B, T, C]`` smoothed features (same length as input).
    """
    if sigma <= 0:
        return x
    if padding is None:
        padding = same_padding(kernel_size)
    taps = jnp.asarray(gaussian_kernel(kernel_size, sigma), dtype=x.dtype)
    c = x.shape[-1]
    # Depthwise conv: feature_group_count = C with kernel [k, 1, C].
    kernel = jnp.tile(taps[:, None, None], (1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[padding],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=c,
    )


def conformer_kernel_size(sigma: float) -> int:
    """Conformer-path tap count: ``int(4*sigma) + 1`` (transformer_ctc.py:73)."""
    return int(sigma * 4) + 1
