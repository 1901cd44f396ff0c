"""Fused TPU kernels (MXU matmul-DFT + Pallas fast paths)."""

from deepxi_tpu.ops.kernels.spectral import (
    apply_gain_reim,
    enhance_frames_pallas,
    stft_mag,
    stft_mag_pallas,
    stft_reim,
    synthesis_from_reim,
)

__all__ = ["apply_gain_reim", "enhance_frames_pallas", "stft_mag",
           "stft_mag_pallas", "stft_reim", "synthesis_from_reim"]
