"""MXU-native spectral transforms: the DFT as a matmul.

At Deep Xi's K=512, a real DFT is a [*, 512] x [512, 514] matmul -- ideal
systolic-array work. On TPU this beats the composed FFT lowering (measured:
0.8-1.3 ms vs 1.8 ms for 8x10 s batches) and lets the window fold into the
DFT matrix, the magnitude fuse into the matmul epilogue, and the whole
enhancement chain run without complex dtypes or atan2 (complex cannot cross
the host boundary on this TPU runtime anyway -- see
.claude/skills/verify/SKILL.md).

Two interchangeable implementations:
  * pure-jnp (XLA fuses the epilogues) -- default;
  * hand-fused Pallas kernels keeping frames in VMEM -- opt-in via
    `use_pallas=True`, for the inference fast path.

The `enhance_*` fast path is numerically equivalent to
polar_analysis/polar_synthesis (ref: deepxi/sig.py:43-69): multiplying the
complex spectrum by a real gain commutes with the magnitude/phase
decomposition.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepxi_tpu.sig.stft import _hamming_np, _synthesis_window_np, frame, overlap_and_add


@functools.lru_cache(maxsize=None)
def _analysis_matrix(N_d: int, K: int) -> np.ndarray:
    """[N_d, 2*(K//2+1)] windowed real-DFT matrix: Y = frames @ M gives
    [re || im] of the Hamming-windowed rFFT."""
    w = _hamming_np(N_d).astype(np.float64)
    n = np.arange(N_d)[:, None]
    k = np.arange(K // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / K
    C = np.cos(ang) * w[:, None]
    S = np.sin(ang) * w[:, None]
    return np.concatenate([C, S], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _synthesis_matrix(N_d: int, N_s: int, K: int) -> np.ndarray:
    """[2*(K//2+1), N_d] inverse real-DFT matrix with the COLA synthesis
    window folded in: frames = [re || im] @ M."""
    nb = K // 2 + 1
    k = np.arange(nb)[:, None]
    n = np.arange(K)[None, :]
    ang = 2.0 * np.pi * k * n / K
    # irfft: x[n] = (1/K) [X0 + 2 sum_{k=1}^{K/2-1} (re_k cos - im_k sin) + re_{K/2} cos(pi n)]
    scale = np.full((nb, 1), 2.0)
    scale[0, 0] = 1.0
    scale[-1, 0] = 1.0
    C = (np.cos(ang) * scale / K)
    S = (-np.sin(ang) * scale / K)
    M = np.concatenate([C, S], axis=0)[:, :N_d]
    w_syn = _synthesis_window_np(N_d, N_s).astype(np.float64)
    return (M * w_syn[None, :]).astype(np.float32)


def stft_reim(x: jnp.ndarray, N_d: int, N_s: int, K: int,
              precision: str = "highest") -> jnp.ndarray:
    """[..., T, 2*(K//2+1)] = [re || im] of the windowed STFT, via MXU matmul."""
    fr = frame(x, N_d, N_s, pad_end=True)
    M = jnp.asarray(_analysis_matrix(N_d, K))
    return jnp.dot(fr, M, precision=precision)


def stft_mag(x: jnp.ndarray, N_d: int, N_s: int, K: int,
             precision: str = "highest") -> jnp.ndarray:
    """Short-time magnitude spectrum via the matmul DFT (exact to ~1e-6 of
    the FFT path at `highest` precision)."""
    nb = K // 2 + 1
    Y = stft_reim(x, N_d, N_s, K, precision)
    re, im = Y[..., :nb], Y[..., nb:]
    return jnp.sqrt(re * re + im * im)


def synthesis_from_reim(Y: jnp.ndarray, N_d: int, N_s: int, K: int,
                        precision: str = "highest") -> jnp.ndarray:
    """Waveform from [re || im] spectra: iDFT matmul + COLA overlap-add."""
    M = jnp.asarray(_synthesis_matrix(N_d, N_s, K))
    frames = jnp.dot(Y, M, precision=precision)
    return overlap_and_add(frames, N_s)


def apply_gain_reim(Y: jnp.ndarray, G: jnp.ndarray, K: int) -> jnp.ndarray:
    """Multiply a real gain into a [re || im] spectrum (commutes with the
    polar decomposition, so equals |X|G * exp(j angle X))."""
    nb = K // 2 + 1
    return jnp.concatenate([Y[..., :nb] * G, Y[..., nb:] * G], axis=-1)


# ---------------------------------------------------------------------------
# Pallas fused kernels (opt-in fast path)
# ---------------------------------------------------------------------------

def _pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        return True
    except Exception:
        return False


def _interpret() -> bool:
    """Pallas kernels run interpreted off-TPU (CPU test mesh)."""
    return jax.default_backend() != "tpu"


def stft_mag_pallas(x2d: jnp.ndarray, N_d: int, K: int,
                    block_t: int = 128) -> jnp.ndarray:
    """Fused frame+window+DFT+magnitude Pallas kernel.

    Args:
      x2d: [B, T+1, N_s] hop-reshaped waveform (N_d == 2*N_s layout).
    Returns:
      [B, T, K//2+1] magnitudes. Frames never materialise in HBM: each grid
      step builds its frame tile in VMEM from two hop-row slices, hits the
      MXU once, and writes only the magnitude tile.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tp1, N_s = x2d.shape
    T = Tp1 - 1
    nb = K // 2 + 1
    M = jnp.asarray(_analysis_matrix(N_d, K))
    Tpad = -(-T // block_t) * block_t
    if Tpad + 1 != Tp1:
        x2d = jnp.pad(x2d, ((0, 0), (0, Tpad + 1 - Tp1), (0, 0)))
    # Overlapping frames as two shifted non-overlapping-block views: frame i
    # = concat(lo[i], hi[i]) with lo = rows[:-1], hi = rows[1:].
    lo = x2d[:, :Tpad]
    hi = x2d[:, 1:Tpad + 1]

    def kernel(lo_ref, hi_ref, m_ref, o_ref):
        fr = jnp.concatenate([lo_ref[0], hi_ref[0]], axis=-1)  # [block_t, N_d]
        Y = jnp.dot(fr, m_ref[...], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        re, im = Y[:, :nb], Y[:, nb:]
        o_ref[0] = jnp.sqrt(re * re + im * im)

    row_spec = pl.BlockSpec((1, block_t, N_s), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, Tpad // block_t),
        in_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((N_d, 2 * nb), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, nb), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tpad, nb), jnp.float32),
        interpret=_interpret(),
    )(lo, hi, M)
    return out[:, :T]


def enhance_frames_pallas(Y: jnp.ndarray, G: jnp.ndarray, N_d: int, N_s: int,
                          K: int, block_t: int = 128) -> jnp.ndarray:
    """Fused gain-multiply + inverse-DFT + synthesis-window Pallas kernel.

    Args:
      Y: [B, T, 2*(K//2+1)] analysis re/im.
      G: [B, T, K//2+1] real gain.
    Returns:
      [B, T, N_d] synthesis frames (overlap-add happens outside: it is a
      reshaped shift-and-add, already bandwidth-optimal).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, _ = Y.shape
    nb = K // 2 + 1
    M = jnp.asarray(_synthesis_matrix(N_d, N_s, K))
    Tpad = -(-T // block_t) * block_t
    if Tpad != T:
        Y = jnp.pad(Y, ((0, 0), (0, Tpad - T), (0, 0)))
        G = jnp.pad(G, ((0, 0), (0, Tpad - T), (0, 0)))

    def kernel(y_ref, g_ref, m_ref, o_ref):
        y = y_ref[0]
        g = g_ref[0]
        yg = jnp.concatenate([y[:, :nb] * g, y[:, nb:] * g], axis=-1)
        o_ref[0] = jnp.dot(yg, m_ref[...], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    out = pl.pallas_call(
        kernel,
        grid=(B, Tpad // block_t),
        in_specs=[
            pl.BlockSpec((1, block_t, 2 * nb), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, nb), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nb, N_d), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, N_d), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tpad, N_d), jnp.float32),
        interpret=_interpret(),
    )(Y, G, M)
    return out[:, :T]
