"""Mel-scaled triangular filter bank (ref: deepxi/sig.py:301-370).

Each filter sums to unity so it can weight the a priori SNR into subband
SNRs for the ``subband_ibm_hat`` output mode (ref: deepxi/model.py:323-328).
Host-side numpy: the bank is a small constant matrix baked into the jitted
graph.
"""

from __future__ import annotations

import functools

import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filter_bank(M: int, K: int, f_s: int) -> np.ndarray:
    """Triangular mel filter bank H with unity-sum filters.

    Args:
      M: number of filters.
      K: FFT size (bank spans K//2 + 1 bins).
      f_s: sampling frequency (Hz).

    Returns:
      [M, K//2+1] float32 matrix. Boundary points follow Huang et al. (2001,
      p. 315), the construction used by the reference (ref: deepxi/sig.py:301-346).
    """
    f_l, f_h = 0.0, f_s / 2.0
    n_bins = K // 2 + 1

    def bpoint(m: int) -> float:
        return ((2.0 * n_bins) / f_s) * mel_to_hz(
            hz_to_mel(f_l) + m * ((hz_to_mel(f_h) - hz_to_mel(f_l)) / (M + 1)))

    H = np.zeros([M, n_bins], dtype=np.float32)
    for m in range(1, M + 1):
        bl, c, bh = bpoint(m - 1), bpoint(m), bpoint(m + 1)
        k = np.arange(n_bins, dtype=np.float64)
        up = (2.0 * (k - bl)) / ((bh - bl) * (c - bl))
        down = (2.0 * (bh - k)) / ((bh - bl) * (bh - c))
        H[m - 1] = np.where((k >= bl) & (k <= c), up, H[m - 1])
        H[m - 1] = np.where((k >= c) & (k <= bh), down, H[m - 1])
    return H
