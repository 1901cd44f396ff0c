"""Adaptive filters: NLMS and LMS (ref: aptfilt/nlms.py:15,
aptfilt/adaptivefilter.py:11, aptfilt/rtaptfilter.py:98-194 -- the reference
wraps `padasip`; here the recursions are native `lax.scan`, so echo/noise
cancellation runs on device).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _tap_matrix(x: jnp.ndarray, n_taps: int) -> jnp.ndarray:
    """[N, n_taps] tap-delay rows: row i = x[i], x[i-1], ..., x[i-n_taps+1]."""
    xp = jnp.concatenate([jnp.zeros((n_taps - 1,), x.dtype), x])
    idx = (jnp.arange(x.shape[0])[:, None] + (n_taps - 1)
           - jnp.arange(n_taps)[None, :])
    return xp[idx]


def nlms(x: jnp.ndarray, d: jnp.ndarray, n_taps: int = 64, mu: float = 0.5,
         eps: float = 1e-3) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normalised LMS: filter the excitation x to track the desired signal d.

    w_{t+1} = w_t + mu * e_t * u_t / (||u_t||^2 + eps)

    Args:
      x: [N] excitation (e.g. far-end/noise reference).
      d: [N] desired signal (e.g. microphone).

    Returns:
      (y, e, w): filter output, error (the cancelled signal), final weights.
    """
    U = _tap_matrix(x, n_taps)

    def step(w, inp):
        u, dt = inp
        y = jnp.dot(u, w)
        e = dt - y
        w = w + mu * e * u / (jnp.dot(u, u) + eps)
        return w, (y, e)

    w0 = jnp.zeros((n_taps,), x.dtype)
    w, (y, e) = jax.lax.scan(step, w0, (U, d))
    return y, e, w


def lms(x: jnp.ndarray, d: jnp.ndarray, n_taps: int = 64, mu: float = 0.01
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Plain LMS: w_{t+1} = w_t + mu * e_t * u_t."""
    U = _tap_matrix(x, n_taps)

    def step(w, inp):
        u, dt = inp
        y = jnp.dot(u, w)
        e = dt - y
        return w + mu * e * u, (y, e)

    w0 = jnp.zeros((n_taps,), x.dtype)
    w, (y, e) = jax.lax.scan(step, w0, (U, d))
    return y, e, w


def cancel_noise(primary: jnp.ndarray, reference: jnp.ndarray,
                 n_taps: int = 64, mu: float = 0.5) -> jnp.ndarray:
    """Adaptive noise cancellation (ref: aptfilt/anc.py:70): the NLMS filter
    models the reference-to-primary noise path; the error signal is the
    cleaned output."""
    _, e, _ = nlms(reference, primary, n_taps=n_taps, mu=mu)
    return e


def block_nlms(x: jnp.ndarray, d: jnp.ndarray, n_taps: int = 64,
               mu: float = 0.5, eps: float = 1e-3, block: int = 256
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Block-updated NLMS (the reference's real-time loop processes frames,
    ref: aptfilt/rtaptfilter.py:98-194): weights update once per block with
    the block-averaged gradient -- better TPU utilisation for long signals."""
    N = (x.shape[0] // block) * block
    U = _tap_matrix(x[:N], n_taps).reshape(N // block, block, n_taps)
    D = d[:N].reshape(N // block, block)

    def step(w, inp):
        u, dt = inp
        y = u @ w
        e = dt - y
        norm = jnp.sum(u * u, axis=-1, keepdims=True) + eps
        w = w + mu * jnp.mean(e[:, None] * u / norm, axis=0)
        return w, (y, e)

    w0 = jnp.zeros((n_taps,), x.dtype)
    w, (y, e) = jax.lax.scan(step, w0, (U, D))
    return y.reshape(-1), e.reshape(-1), w
