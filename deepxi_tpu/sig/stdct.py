"""Short-time discrete cosine transform, matching the reference's
``deepxi/dct.py`` (itself a re-plumbing of ``tf.signal`` internals).

The reference composes: frame(pad_end) -> window -> ``tf.signal.dct``
(type-II, unnormalised) for analysis (ref: deepxi/dct.py:18-50), and
``tf.signal.idct`` (type-III, unnormalised, i.e. ``idct(dct(x)) == 2K * x``)
-> truncate/pad to N_d -> synthesis window -> overlap-add for synthesis
(ref: deepxi/dct.py:52-117). We reproduce those exact conventions.

TPU note: at K=512 a DCT is a [*, 512] x [512, 512] matmul -- ideal MXU work,
so we implement it directly as a matmul with a cached coefficient matrix
instead of an FFT factorisation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from deepxi_tpu.sig.stft import (
    _synthesis_window_np,
    frame,
    hamming_window,
    overlap_and_add,
)


@functools.lru_cache(maxsize=None)
def _dct2_matrix(N: int) -> np.ndarray:
    """Unnormalised DCT-II matrix M with y = x @ M: M[n, k] = 2 cos(pi k (2n+1) / 2N)."""
    n = np.arange(N, dtype=np.float64)[:, None]
    k = np.arange(N, dtype=np.float64)[None, :]
    return (2.0 * np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * N))).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dct3_matrix(N: int) -> np.ndarray:
    """Unnormalised DCT-III matrix M with y = x @ M:
    y[n] = x[0] + 2 sum_{k>=1} x[k] cos(pi (2n+1) k / 2N)."""
    n = np.arange(N, dtype=np.float64)[None, :]
    k = np.arange(N, dtype=np.float64)[:, None]
    M = 2.0 * np.cos(np.pi * (2.0 * n + 1.0) * k / (2.0 * N))
    M[0, :] = 1.0
    return M.astype(np.float32)


def dct2(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Type-II DCT over the last axis, ``tf.signal.dct(x, type=2, n=n)`` semantics."""
    N = x.shape[-1] if n is None else n
    if N != x.shape[-1]:
        if N < x.shape[-1]:
            x = x[..., :N]
        else:
            pads = [(0, 0)] * (x.ndim - 1) + [(0, N - x.shape[-1])]
            x = jnp.pad(x, pads)
    return x @ jnp.asarray(_dct2_matrix(N))


def dct3(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Type-III DCT (``tf.signal.idct(x, type=2)``): inverse of dct2 up to 2N."""
    N = x.shape[-1] if n is None else n
    if N != x.shape[-1]:
        if N < x.shape[-1]:
            x = x[..., :N]
        else:
            pads = [(0, 0)] * (x.ndim - 1) + [(0, N - x.shape[-1])]
            x = jnp.pad(x, pads)
    return x @ jnp.asarray(_dct3_matrix(N))


def stdct(x: jnp.ndarray, N_d: int, N_s: int, K: int) -> jnp.ndarray:
    """Short-time DCT: frame(pad_end) -> Hamming window -> DCT-II(K).

    [..., T, K] real coefficients (ref: deepxi/dct.py:18-50; window bound at
    deepxi/sig.py:81-82).
    """
    window = hamming_window(N_d)
    frames = frame(x, N_d, N_s, pad_end=True) * window
    return dct2(frames, n=K)


def inverse_stdct(S: jnp.ndarray, N_d: int, N_s: int, K: int) -> jnp.ndarray:
    """Inverse short-time DCT: DCT-III -> truncate to N_d -> COLA synthesis
    window -> overlap-add (ref: deepxi/dct.py:52-117).

    Note the reference inherits TF's unnormalised ``idct``, so a round trip
    carries the 2K scale of ``idct(dct(x)) == 2K x``; we reproduce that
    faithfully (validated against tf.signal in tests/golden).
    """
    frames = dct3(S, n=K)[..., :N_d]
    if N_d > K:
        pads = [(0, 0)] * (frames.ndim - 1) + [(0, N_d - K)]
        frames = jnp.pad(frames, pads)
    w_syn = jnp.asarray(_synthesis_window_np(N_d, N_s))
    return overlap_and_add(frames * w_syn, N_s)
