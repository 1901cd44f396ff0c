"""ASR front-end features: MFCC / (log) mel filterbank / SSC
(ref: r_mfcc/base.py:53-500, r_mfcc/sigproc.py:10-152 -- the package the
fork imports as `asr_mfcc.base`, python_speech_features semantics).

Pure JAX, batched and jittable; the filterbank matmul rides the MXU.
Conventions match python_speech_features: preemphasis 0.97, 25 ms / 10 ms
frames padded with ceil framing, HTK mel points, |rfft|^2 / nfft power
spectrum, DCT-II(ortho) cepstra with sinusoidal liftering, c0 optionally
replaced by log frame energy.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def preemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """y[0] = x[0]; y[n] = x[n] - coeff x[n-1] (ref: r_mfcc/sigproc.py)."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - coeff * x[..., :-1]], -1)


def framesig(x: jnp.ndarray, frame_len: int, frame_step: int) -> jnp.ndarray:
    """python_speech_features framing: ceil count, zero pad at the end."""
    n = x.shape[-1]
    if n <= frame_len:
        T = 1
    else:
        T = 1 + math.ceil((n - frame_len) / frame_step)
    pad = (T - 1) * frame_step + frame_len - n
    pads = [(0, 0)] * (x.ndim - 1) + [(0, max(pad, 0))]
    x = jnp.pad(x, pads)
    idx = np.arange(T)[:, None] * frame_step + np.arange(frame_len)[None, :]
    return x[..., idx]


def powspec(frames: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """|rfft|^2 / nfft power spectrum."""
    F = jnp.fft.rfft(frames, n=nfft, axis=-1)
    return (jnp.abs(F) ** 2) / nfft


def hz2mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel2hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def get_filterbanks(nfilt: int, nfft: int, samplerate: int,
                    lowfreq: float = 0.0,
                    highfreq: Optional[float] = None) -> np.ndarray:
    """[nfilt, nfft//2+1] HTK triangular mel bank (python_speech_features
    convention, ref: r_mfcc/base.py)."""
    highfreq = highfreq or samplerate / 2.0
    melpts = np.linspace(hz2mel(lowfreq), hz2mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpts) / samplerate).astype(int)
    fb = np.zeros([nfilt, nfft // 2 + 1], np.float32)
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fb[j, i] = (i - bins[j]) / max(bins[j + 1] - bins[j], 1)
        for i in range(bins[j + 1], bins[j + 2]):
            fb[j, i] = (bins[j + 2] - i) / max(bins[j + 2] - bins[j + 1], 1)
    return fb


def fbank(signal: jnp.ndarray, samplerate: int = 16000, winlen: float = 0.025,
          winstep: float = 0.01, nfilt: int = 26, nfft: int = 512,
          lowfreq: float = 0.0, highfreq: Optional[float] = None,
          preemph: float = 0.97) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mel filterbank energies + frame energies: ([..., T, nfilt], [..., T])."""
    x = preemphasis(signal, preemph)
    frames = framesig(x, int(winlen * samplerate), int(winstep * samplerate))
    ps = powspec(frames, nfft)
    energy = jnp.maximum(jnp.sum(ps, axis=-1), np.finfo(np.float32).tiny)
    fb = jnp.asarray(get_filterbanks(nfilt, nfft, samplerate, lowfreq, highfreq))
    feat = jnp.maximum(ps @ fb.T, np.finfo(np.float32).tiny)
    return feat, energy


def logfbank(signal: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Log mel filterbank energies -- the `asr_mfcc.base.logfbank` the fork
    imports (ref: deepxi/model.py:30)."""
    feat, _ = fbank(signal, **kwargs)
    return jnp.log(feat)


@functools.lru_cache(maxsize=None)
def _dct2_ortho(n_in: int, n_out: int) -> np.ndarray:
    """[n_in, n_out] orthonormal DCT-II matrix (scipy dct norm='ortho')."""
    k = np.arange(n_out)[None, :]
    n = np.arange(n_in)[:, None]
    M = 2.0 * np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    M *= np.sqrt(1.0 / (2.0 * n_in))   # scipy ortho scale, k > 0
    M[:, 0] /= np.sqrt(2.0)            # k == 0 scale is sqrt(1/(4N))
    return M.astype(np.float32)


def lifter(cepstra: jnp.ndarray, L: int = 22) -> jnp.ndarray:
    """Sinusoidal liftering (ref: r_mfcc/base.py)."""
    if L <= 0:
        return cepstra
    n = np.arange(cepstra.shape[-1])
    lift = 1.0 + (L / 2.0) * np.sin(np.pi * n / L)
    return cepstra * jnp.asarray(lift.astype(np.float32))


def mfcc(signal: jnp.ndarray, samplerate: int = 16000, winlen: float = 0.025,
         winstep: float = 0.01, numcep: int = 13, nfilt: int = 26,
         nfft: int = 512, lowfreq: float = 0.0,
         highfreq: Optional[float] = None, preemph: float = 0.97,
         ceplifter: int = 22, append_energy: bool = True) -> jnp.ndarray:
    """[..., T, numcep] mel-frequency cepstral coefficients."""
    feat, energy = fbank(signal, samplerate, winlen, winstep, nfilt, nfft,
                         lowfreq, highfreq, preemph)
    logf = jnp.log(feat)
    M = jnp.asarray(_dct2_ortho(nfilt, numcep))
    cep = logf @ M
    cep = lifter(cep, ceplifter)
    if append_energy:
        cep = cep.at[..., 0].set(jnp.log(energy))
    return cep


def ssc(signal: jnp.ndarray, samplerate: int = 16000, winlen: float = 0.025,
        winstep: float = 0.01, nfilt: int = 26, nfft: int = 512,
        lowfreq: float = 0.0, highfreq: Optional[float] = None,
        preemph: float = 0.97) -> jnp.ndarray:
    """Spectral subband centroids (ref: r_mfcc/base.py)."""
    x = preemphasis(signal, preemph)
    frames = framesig(x, int(winlen * samplerate), int(winstep * samplerate))
    ps = jnp.maximum(powspec(frames, nfft), 1e-30)
    fb = jnp.asarray(get_filterbanks(nfilt, nfft, samplerate, lowfreq, highfreq))
    # psf convention: bin centre frequencies linspace(1, fs/2)
    freqs = jnp.asarray(np.linspace(1, samplerate / 2, ps.shape[-1],
                                    dtype=np.float32))
    feat = ps @ fb.T
    return (ps * freqs) @ fb.T / feat


def delta(feat: jnp.ndarray, N: int = 2) -> jnp.ndarray:
    """Delta features over the time axis (ref: r_mfcc/base.py)."""
    denom = 2.0 * sum(i * i for i in range(1, N + 1))
    T = feat.shape[-2]
    padded = jnp.concatenate(
        [jnp.repeat(feat[..., :1, :], N, axis=-2), feat,
         jnp.repeat(feat[..., -1:, :], N, axis=-2)], axis=-2)
    out = jnp.zeros_like(feat)
    for i in range(1, N + 1):
        out = out + i * (padded[..., N + i:N + i + T, :]
                         - padded[..., N - i:N - i + T, :])
    return out / denom
