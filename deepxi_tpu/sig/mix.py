"""SNR mixing machinery and instantaneous SNR definitions (ref: deepxi/sig.py:97-299).

Differences from the reference are TPU-idiomatic, not semantic:

  * All randomness flows through threaded ``jax.random`` keys (the reference
    uses an unseeded ``tf.random.uniform``, ref: deepxi/sig.py:276), making
    training exactly reproducible.
  * The batch path is a ``vmap`` over static-shape padded waveforms + length
    masks instead of ``tf.map_fn`` with per-element slicing
    (ref: deepxi/sig.py:214-256); numerics are identical because powers are
    computed over the unpadded prefix via masks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalise(x: jnp.ndarray) -> jnp.ndarray:
    """int16 waveform -> float32 in [-1, 1) by dividing by 32768
    (ref: deepxi/sig.py:189-199)."""
    return x.astype(jnp.float32) / 32768.0


def xi(S: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Instantaneous a priori SNR: S^2 / max(D^2, 1e-12) (ref: deepxi/sig.py:110-121)."""
    return jnp.square(S) / jnp.maximum(jnp.square(D), 1e-12)


def gamma(X: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Instantaneous a posteriori SNR: X^2 / max(D^2, 1e-12) (ref: deepxi/sig.py:123-134)."""
    return jnp.square(X) / jnp.maximum(jnp.square(D), 1e-12)


def cd(S: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Constructive/destructive product S*D used by STDCTXiCD (ref: deepxi/sig.py:136-147)."""
    return S * D


def _masked_mean_power(w: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Mean of w^2 over the first ``length`` samples of a padded waveform."""
    n = w.shape[-1]
    mask = jnp.arange(n) < length
    return jnp.sum(jnp.square(w) * mask, axis=-1) / jnp.maximum(length.astype(jnp.float32), 1.0)


def add_noise(key: jax.Array, s: jnp.ndarray, d: jnp.ndarray,
              s_len: jnp.ndarray, d_len: jnp.ndarray,
              snr_db_level: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mix a random noise segment into clean speech at an exact SNR.

    Mirrors the reference (ref: deepxi/sig.py:258-284): draw a random offset
    i ~ U{0, d_len - s_len}, take the noise segment d[i:i+s_len], scale it by
    alpha = sqrt(P_s / max(P_d * 10^(snr/10), 1e-12)) and add.

    Args:
      key: PRNG key (replaces the reference's unseeded tf.random.uniform).
      s: [L] float32 padded clean speech (valid prefix s_len).
      d: [L_d] float32 padded noise (valid prefix d_len). INVARIANT:
         d_len >= s_len -- callers must validate at the host boundary
         (the loader and framework drivers do); inside jit a violation
         silently mixes zero-padded noise, which inflates alpha.
      s_len, d_len: scalar int32 valid lengths.
      snr_db_level: scalar SNR in dB.

    Returns:
      (x, d_scaled): both [L], zero beyond s_len.
    """
    L = s.shape[-1]
    snr_lin = jnp.power(10.0, snr_db_level.astype(jnp.float32) / 10.0)
    i = jax.random.randint(key, (), 0, jnp.maximum(1 + d_len - s_len, 1))
    # Bring d[i:] to the front; samples beyond s_len are masked to zero below.
    d_seg = jnp.roll(d, -i)[..., :L]
    mask = (jnp.arange(L) < s_len).astype(s.dtype)
    s = s * mask
    d_seg = d_seg * mask
    P_s = _masked_mean_power(s, s_len)
    P_d = _masked_mean_power(d_seg, s_len)
    alpha = jnp.sqrt(P_s / jnp.maximum(P_d * snr_lin, 1e-12))
    d_scaled = d_seg * alpha
    x = s + d_scaled
    return x, d_scaled


def add_noise_batch(key: jax.Array, s: jnp.ndarray, d: jnp.ndarray,
                    s_len: jnp.ndarray, d_len: jnp.ndarray,
                    snr_db_level: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched mixing (ref: deepxi/sig.py:214-256): returns (x, s_masked, d_scaled).

    Args:
      key: PRNG key, split per example.
      s, d: [B, L] float32 padded waveforms.
      s_len, d_len: [B] int32.
      snr_db_level: [B] SNR levels (dB).
    """
    keys = jax.random.split(key, s.shape[0])
    x, d_scaled = jax.vmap(add_noise)(keys, s, d, s_len, d_len, snr_db_level)
    mask = (jnp.arange(s.shape[-1])[None, :] < s_len[:, None]).astype(s.dtype)
    return x, s * mask, d_scaled


def mix(key: jax.Array, s: jnp.ndarray, d: jnp.ndarray,
        s_len: jnp.ndarray, d_len: jnp.ndarray, snr_db_level: jnp.ndarray,
        N_s: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normalise int16 inputs, mix at SNR, and report frame counts
    (ref: deepxi/sig.py:162-187). Batched ([B, L]) only; single waveforms are
    handled by adding a leading axis.

    Returns (s, d, x, n_frames) where n_frames = ceil(s_len / N_s).
    """
    s = normalise(s)
    d = normalise(d)
    x, s, d = add_noise_batch(key, s, d, s_len, d_len, snr_db_level)
    nf = jnp.ceil(s_len.astype(jnp.float32) / float(N_s)).astype(jnp.int32)
    return s, d, x, nf


def snr_db(s: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Actual SNR (dB) between speech and noise (ref: deepxi/sig.py:286-299)."""
    P_s = jnp.mean(jnp.square(s), axis=-1)
    P_d = jnp.mean(jnp.square(d), axis=-1)
    return 10.0 * jnp.log10(P_s / P_d)


def spectral_distortion(instantaneous: jnp.ndarray, estimate: jnp.ndarray) -> jnp.ndarray:
    """Frame-wise RMS dB distortion between an instantaneous SNR and its
    estimate (ref: deepxi/sig.py:384-403; the reference function contains a
    copy-paste defect -- it converts `instantaneous` twice -- which the
    MATLAB scorer spectral_distortion_xi.m does not have; we implement the
    intended metric)."""
    inst_db = 10.0 * jnp.log10(jnp.maximum(instantaneous, 1e-12))
    est_db = 10.0 * jnp.log10(jnp.maximum(estimate, 1e-12))
    rms = jnp.sqrt(jnp.mean(jnp.square(inst_db - est_db), axis=-1))
    return jnp.mean(rms)
