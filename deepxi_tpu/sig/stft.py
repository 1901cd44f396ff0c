"""Short-time Fourier analysis/synthesis, TF-`tf.signal`-exact, in pure JAX.

Reproduces the reference DSP chain (ref: deepxi/sig.py:22-95) bit-for-bit at
float32 tolerance:

  * Hamming window with ``periodic=False`` (symmetric) -- the reference binds
    ``window_ops.hamming_window(periodic=False)`` (ref: deepxi/sig.py:38-39).
  * ``tf.signal.stft(x, N_d, N_s, K, pad_end=True)`` framing: the number of
    frames is ``ceil(len / N_s)`` and the signal is zero-padded at the end so
    every frame is full (ref: deepxi/sig.py:53-55).
  * ``tf.signal.inverse_stft(..., window_fn=tf.signal.inverse_stft_window_fn)``
    synthesis: irFFT -> truncate to N_d -> multiply by the COLA-normalised
    synthesis window -> overlap-add with hop N_s (ref: deepxi/sig.py:57-69).

Everything here is shape-static and jit-friendly: sequence length enters as a
Python int (from the bucketed batch shape), never as a traced value.

TPU notes: framing is a gather, the rFFT lowers to XLA's TPU FFT (itself a
matmul at K=512); `deepxi_tpu.ops.kernels.spectral` provides a fused Pallas
frame+window+DFT kernel used on the inference fast path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _hamming_np(length: int, periodic: bool = False) -> np.ndarray:
    """Host-side Hamming window (float64 accumulation, float32 result)."""
    if length == 1:
        return np.ones((1,), np.float32)
    denom = length if periodic else length - 1
    n = np.arange(length, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / denom)).astype(np.float32)


def hamming_window(length: int, periodic: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    """Hamming window matching ``tf.signal.hamming_window``.

    ``periodic=False`` gives the symmetric window
    ``0.54 - 0.46 cos(2 pi n / (length - 1))`` used by the reference.
    """
    return jnp.asarray(_hamming_np(length, periodic), dtype)


def n_frames(n_samples: int, N_s: int) -> int:
    """Frame count for ``pad_end=True`` framing: ``ceil(n_samples / N_s)``.

    Matches the reference's ``InputTarget.n_frames`` (ref: deepxi/sig.py:201-212)
    which equals the frame count of ``tf.signal.stft(pad_end=True)``.
    """
    return -(-int(n_samples) // int(N_s))


def frame(x: jnp.ndarray, N_d: int, N_s: int, pad_end: bool = True) -> jnp.ndarray:
    """Frame a signal along the last axis, ``tf.signal.frame`` semantics.

    Args:
      x: [..., n_samples] waveform.
      N_d: frame length.
      N_s: frame step.
      pad_end: zero-pad so the last partial frame is kept (reference always
        frames with pad_end=True).

    Returns:
      [..., T, N_d] frames, T = ceil(n/N_s) if pad_end else 1+(n-N_d)//N_s.
    """
    n = x.shape[-1]
    if pad_end:
        T = n_frames(n, N_s)
        pad_len = max((T - 1) * N_s + N_d - n, 0)
        pads = [(0, 0)] * (x.ndim - 1) + [(0, pad_len)]
        x = jnp.pad(x, pads)
    else:
        T = 1 + (n - N_d) // N_s
    if N_d == 2 * N_s:
        # Deep Xi's 50%-overlap case: frame i is rows (i, i+1) of the
        # [T+1, N_s] reshape -- a slice+concat instead of a large gather
        # (measurably faster on TPU, where gathers serialize).
        x2 = x[..., : (T + 1) * N_s].reshape(x.shape[:-1] + (T + 1, N_s))
        return jnp.concatenate([x2[..., :T, :], x2[..., 1:T + 1, :]], axis=-1)
    idx = np.arange(T)[:, None] * N_s + np.arange(N_d)[None, :]
    return x[..., idx]


def stft(x: jnp.ndarray, N_d: int, N_s: int, K: int,
         window: jnp.ndarray | None = None) -> jnp.ndarray:
    """Complex STFT: frame -> window -> rFFT(K). [..., T, K//2+1].

    Matches ``tf.signal.stft(x, N_d, N_s, K, hamming(periodic=False),
    pad_end=True)`` (ref: deepxi/sig.py:53-55).
    """
    if window is None:
        window = hamming_window(N_d)
    frames = frame(x, N_d, N_s, pad_end=True) * window
    if K > N_d:
        pads = [(0, 0)] * (frames.ndim - 1) + [(0, K - N_d)]
        frames = jnp.pad(frames, pads)
    return jnp.fft.rfft(frames[..., :K], n=K, axis=-1)


def polar_analysis(x: jnp.ndarray, N_d: int, N_s: int, K: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Short-time magnitude and phase spectra (ref: deepxi/sig.py:43-55)."""
    X = stft(x, N_d, N_s, K)
    return jnp.abs(X), jnp.angle(X)


@functools.lru_cache(maxsize=None)
def _synthesis_window_np(N_d: int, N_s: int) -> np.ndarray:
    """COLA-normalised synthesis window of ``tf.signal.inverse_stft_window_fn``.

    w_syn[n] = w[n] / sum_k w[n mod N_s + k*N_s]^2  (sum over the ceil(N_d/N_s)
    overlapping window positions), computed in float64 then cast.
    """
    w = _hamming_np(N_d).astype(np.float64)
    denom = np.square(w)
    overlaps = -(-N_d // N_s)
    denom = np.pad(denom, (0, overlaps * N_s - N_d))
    denom = denom.reshape(overlaps, N_s).sum(axis=0)
    denom = np.tile(denom, overlaps)[:N_d]
    return (w / denom).astype(np.float32)


def overlap_and_add(frames: jnp.ndarray, N_s: int) -> jnp.ndarray:
    """Overlap-add along the last two axes, ``tf.signal.overlap_and_add``.

    Args:
      frames: [..., T, N_d].
      N_s: hop size.

    Returns:
      [..., (T-1)*N_s + N_d] signal.
    """
    T, N_d = frames.shape[-2], frames.shape[-1]
    out_len = (T - 1) * N_s + N_d
    if N_d == 2 * N_s:
        # 50%-overlap case: out row i = first_half[i] + second_half[i-1];
        # pure shift-and-add, no scatter (TPU scatters serialize badly).
        h1 = frames[..., :N_s]
        h2 = frames[..., N_s:]
        zrow = [(0, 0)] * (frames.ndim - 2)
        h1 = jnp.pad(h1, zrow + [(0, 1), (0, 0)])
        h2 = jnp.pad(h2, zrow + [(1, 0), (0, 0)])
        return (h1 + h2).reshape(frames.shape[:-2] + (out_len,))
    # General hop: scatter-add each frame at its offset. Static shapes.
    idx = (np.arange(T)[:, None] * N_s + np.arange(N_d)[None, :]).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (T * N_d,))

    def _oa(v):
        return jnp.zeros((out_len,), frames.dtype).at[idx].add(v)

    for _ in range(frames.ndim - 2):
        _oa = jax.vmap(_oa)
    return _oa(flat)


def inverse_stft(X: jnp.ndarray, N_d: int, N_s: int, K: int) -> jnp.ndarray:
    """Inverse STFT matching ``tf.signal.inverse_stft`` with the
    ``inverse_stft_window_fn`` synthesis window (ref: deepxi/sig.py:57-69).

    Args:
      X: [..., T, K//2+1] complex spectra.

    Returns:
      [..., (T-1)*N_s + N_d] waveform.
    """
    frames = jnp.fft.irfft(X, n=K, axis=-1)[..., :N_d]
    w_syn = jnp.asarray(_synthesis_window_np(N_d, N_s))
    return overlap_and_add(frames * w_syn, N_s)


def polar_synthesis(STMS: jnp.ndarray, STPS: jnp.ndarray, N_d: int, N_s: int, K: int) -> jnp.ndarray:
    """Waveform from magnitude + phase (ref: deepxi/sig.py:57-69)."""
    X = STMS.astype(jnp.complex64) * jnp.exp(1j * STPS.astype(jnp.complex64))
    return inverse_stft(X, N_d, N_s, K)
