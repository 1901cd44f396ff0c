"""Standalone normalisation library: frame-wise, sequence-wise and causal
sequence-wise layer normalisation with sequence masking.

ref: deepxi/normalisation.py:15-150 (TF1 ``Normalisation`` dispatch,
``SeqCausalLayerNorm`` :37-66, ``FrameLayerNorm`` :69-97, ``SeqLayerNorm``
:132-150). The reference file is dead TF1 code (``tf.get_variable`` /
``variable_scope``) that cannot even be imported under the fork's TF2 — its
``SequenceLayerNorm`` Keras class carries a Python ``IndentationError`` at
:128, and it is in fact an embedding lookup, not a normalisation (both
defects catalogued in SURVEY.md; neither is reproduced). This module rebuilds
the *intended* semantics as jittable pure functions.

TPU-native notes: the causal running moments are closed-form cumulative sums
(``jnp.cumsum`` over time — one pass, fully vectorised over batch/features,
no ``lax.scan``), so the whole op fuses into a handful of XLA elementwise
kernels. The causal variance reproduces the reference's exact estimator:
each frame's squared deviation is taken from *its own* running mean before
the cumulative sum (``normalisation.py:57-58``) — a Welford-style
approximation, not the true causal variance; kept for parity and noted here.

Two reference defects fixed (not reproduced):
  * ``Normalisation`` with an unknown ``norm_type`` evaluates
    ``ValueError(...)`` without ``raise`` and falls through to return
    ``None`` (``normalisation.py:34``); here it raises.
  * ``SeqCausalLayerNorm``'s denominator ``(t+1) * F`` keeps growing past
    each sequence's true length (``normalisation.py:55``) — harmless there
    only because outputs are masked to zero afterwards; here the padded
    region is likewise masked, and inputs are masked before the cumulative
    sums so garbage in the padding can never leak into valid frames (the
    reference relies on the caller zero-padding).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_EPS = 1e-12  # reference variance_epsilon (normalisation.py:66,97,148)


def _seq_mask(seq_len: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """``tf.sequence_mask`` as float: [B] lengths -> [B, T] {0,1}."""
    return (jnp.arange(max_len)[None, :] < seq_len[:, None]).astype(jnp.float32)


def frame_layer_norm(
    x: jnp.ndarray,
    beta: Optional[jnp.ndarray] = None,
    gamma: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Frame-wise layer norm: moments over the channel axis per (b, t).

    ref: deepxi/normalisation.py:69-97 (``tf.nn.moments`` over -1, then
    ``batch_normalization`` with eps 1e-12).
    """
    mu = jnp.mean(x, axis=-1, keepdims=True)
    sigma = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * (1.0 / jnp.sqrt(sigma + _EPS))
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y


def seq_layer_norm(
    x: jnp.ndarray,
    seq_len: jnp.ndarray,
    beta: Optional[jnp.ndarray] = None,
    gamma: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sequence-wise layer norm: one (mu, sigma) per sequence over all valid
    frames and channels, output re-masked.

    ref: deepxi/normalisation.py:132-150.
    """
    mask = _seq_mask(seq_len, x.shape[1])[..., None]          # [B, T, 1]
    den = jnp.sum(mask, axis=1, keepdims=True) * x.shape[-1]  # [B, 1, 1]
    mu = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / den
    sigma = jnp.sum(jnp.square(x - mu) * mask, axis=(1, 2), keepdims=True) / den
    y = (x - mu) * (1.0 / jnp.sqrt(sigma + _EPS))
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y * mask


def seq_causal_layer_norm(
    x: jnp.ndarray,
    seq_len: jnp.ndarray,
    beta: Optional[jnp.ndarray] = None,
    gamma: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Causal sequence-wise layer norm: frame t is normalised by cumulative
    moments over frames 0..t (causal LN variant of arXiv:1510.01378).

    ref: deepxi/normalisation.py:37-66. The cumulative mean uses
    ``den[t] = (t+1) * F``; the cumulative "variance" accumulates each
    frame's squared deviation from *its own* running mean (reference
    estimator, reproduced exactly — see module docstring). Inputs are
    masked before the sums (defect fix, see module docstring).
    """
    f = x.shape[-1]
    mask = _seq_mask(seq_len, x.shape[1])                       # [B, T]
    xm = x * mask[..., None]
    den = jnp.arange(1, x.shape[1] + 1, dtype=x.dtype) * f      # [T]
    mu = jnp.cumsum(jnp.sum(xm, axis=-1), axis=-1) / den        # [B, T]
    mu = mu[..., None]                                          # [B, T, 1]
    dev = jnp.sum(jnp.square(xm - mu), axis=-1)                 # [B, T]
    sigma = (jnp.cumsum(dev, axis=-1) / den)[..., None]         # [B, T, 1]
    y = (x - mu) * (1.0 / jnp.sqrt(sigma + _EPS))
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y * mask[..., None]


def normalisation(
    x: jnp.ndarray,
    norm_type: str = "FrameLayerNorm",
    seq_len: Optional[jnp.ndarray] = None,
    beta: Optional[jnp.ndarray] = None,
    gamma: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch matching the reference's ``Normalisation``.

    ref: deepxi/normalisation.py:15-34. Unknown types raise here (the
    reference builds the ValueError and forgets to raise it — defect fixed).
    """
    if norm_type == "SeqCausalLayerNorm":
        return seq_causal_layer_norm(x, seq_len, beta, gamma)
    if norm_type == "SeqLayerNorm":
        return seq_layer_norm(x, seq_len, beta, gamma)
    if norm_type == "FrameLayerNorm":
        return frame_layer_norm(x, beta, gamma)
    if norm_type == "unnormalised":
        return x
    raise ValueError(f"Normalisation type does not exist: {norm_type}.")
