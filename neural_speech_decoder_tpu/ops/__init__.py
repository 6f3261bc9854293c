from .ctc import ctc_feasible, ctc_loss
from .day_affine import day_affine, init_day_affine
from .decode import batch_per, edit_distance, greedy_decode
from .gaussian import (
    conformer_kernel_size,
    gaussian_kernel,
    gaussian_smooth,
    same_padding,
)
from .noise import apply_noise, mean_drift_noise, white_noise
from .specaugment import spec_augment
from .unfold import ctc_input_lengths, unfold, unfold_matmul, unfold_output_length

__all__ = [
    "ctc_feasible",
    "ctc_loss",
    "day_affine",
    "init_day_affine",
    "batch_per",
    "edit_distance",
    "greedy_decode",
    "conformer_kernel_size",
    "gaussian_kernel",
    "gaussian_smooth",
    "same_padding",
    "apply_noise",
    "mean_drift_noise",
    "white_noise",
    "spec_augment",
    "ctc_input_lengths",
    "unfold",
    "unfold_matmul",
    "unfold_output_length",
]
