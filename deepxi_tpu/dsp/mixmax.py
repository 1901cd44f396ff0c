"""Log-spectral MixMax speech estimator with per-phoneme clean Gaussians and
an adaptive noise Gaussian (ref: hybrid/hybridMixMax.py:201-391).

The MixMax observation model: noisy log-spectrum z = max(x, g) with clean
x ~ N(mu_i, sigma_i) per phoneme class i and noise g ~ N(mu_g, sigma_g).
The clean estimate mixes z with the class conditional mean via the posterior
rho = f G / (f G + F g):   x_hat = sum_i p_i [rho_i z + beta_i (1 - rho_i)],
floored at z + delta (ref: hybridMixMax.py:331-347).

All math is vectorised over frames and phoneme classes (the reference is a
per-frame host loop, ref: deepxi/inp_tgt.py:1066-1071); the adaptive noise
tracker is a `lax.scan`.

NOTE: the fork's phoneme Gaussian artifacts live on hard-coded private paths
(ref: hybrid/hybridMixMax.py:440-443) and are not in the repo, so this module
takes the Gaussians as explicit arguments (SURVEY.md section 7, step 9).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm


class MixMaxModel(NamedTuple):
    """Per-phoneme clean-speech Gaussians + noise Gaussian in the log-STMS
    domain. Shapes: x_mu/x_sigma [P, F]; g_mu/g_sigma [F]; prio_p [P]."""
    x_mu: jnp.ndarray
    x_sigma: jnp.ndarray
    g_mu: jnp.ndarray
    g_sigma: jnp.ndarray
    prio_p: jnp.ndarray
    alpha: float = 0.01
    beta: float = 0.99


def default_delta(n_bins: int = 257) -> jnp.ndarray:
    """Spectral floor offset: log(0.03) on the low 185 bins, log(0.01) above
    (ref: hybrid/hybridMixMax.py:210-212)."""
    lo = np.full(min(185, n_bins), 0.03)
    hi = np.full(max(n_bins - 185, 0), 0.01)
    return jnp.asarray(np.log(np.concatenate([lo, hi])), jnp.float32)


def _posteriors(model: MixMaxModel, p_prior: jnp.ndarray, z: jnp.ndarray):
    """rho_ik, R_ik and class posteriors p_mm for one frame
    (ref: hybrid/hybridMixMax.py:285-305).

    z: [F] log-magnitude frame. Returns ([P,F], [P,F], [P])."""
    eps = jnp.finfo(jnp.float32).tiny
    f_ik = norm.pdf(z[None], model.x_mu, model.x_sigma)
    F_ik = norm.cdf(z[None], model.x_mu, model.x_sigma)
    g_k = norm.pdf(z, model.g_mu, model.g_sigma)[None]
    G_k = norm.cdf(z, model.g_mu, model.g_sigma)[None]
    h_ik = jnp.maximum(f_ik * G_k + F_ik * g_k, eps)
    log_h_i = jnp.sum(jnp.log(h_ik), axis=1)
    # normalised in log space for stability (the reference exponentiates raw
    # products and eps-guards the zeros)
    log_w = jnp.log(jnp.maximum(p_prior, eps)) + log_h_i
    p_mm = jax.nn.softmax(log_w)
    f_G = f_ik * G_k
    F_g = jnp.maximum(F_ik * g_k, eps)
    rho = f_G / (f_G + F_g)
    R = f_ik / jnp.maximum(F_ik, eps)
    return rho, R, p_mm


def estimate_frame(model: MixMaxModel, p_post: jnp.ndarray, z: jnp.ndarray,
                   delta: jnp.ndarray,
                   nn_weighted: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MixMax clean log-spectrum estimate for one frame.

    With ``nn_weighted=False`` (the fork's default path,
    ref: hybrid/hybridMixMax.py:331-347 x_estimate_mixmax) the class
    posteriors p_mm come from the STATIC prior and `p_post` only weights the
    returned presence rho; with ``nn_weighted=True``
    (ref: hybridMixMax.py:349-361 x_estimate_mixmax_nn) `p_post` drives the
    estimate itself.

    Returns (x_hat [F], rho_bar [F])."""
    rho, R, p_mm_prior = _posteriors(model, model.prio_p, z)
    if nn_weighted:
        _, _, p_mm = _posteriors(model, p_post, z)
    else:
        p_mm = p_mm_prior
    beta_ik = model.x_mu - jnp.square(model.x_sigma) * R
    o = rho * z[None] + beta_ik * (1.0 - rho)
    x_hat = jnp.sum(p_mm[:, None] * o, axis=0)
    x_hat = jnp.maximum(z + delta, x_hat)
    # returned presence weighting matches the reference per variant: the
    # static-prior path sums rho with the CALLER's posteriors
    # (ref: hybridMixMax.py:344-346), the nn path with the MixMax
    # posteriors themselves (ref: hybridMixMax.py:358-359)
    rho_w = p_mm if nn_weighted else p_post
    rho_bar = jnp.maximum(jnp.sum(rho_w[:, None] * rho, axis=0),
                          jnp.finfo(jnp.float32).tiny)
    return x_hat, rho_bar


def enhance(model: MixMaxModel, log_mag: jnp.ndarray,
            posteriors: jnp.ndarray = None,
            track_noise: bool = True,
            nn_weighted: bool = False) -> jnp.ndarray:
    """Enhance a [T, F] log-magnitude spectrogram.

    Args:
      posteriors: optional [T, P] phoneme posteriors (e.g. from the
        MagPhonemes network); defaults to the model prior per frame.
      track_noise: adapt the noise Gaussian with the presence-weighted
        recursion of the reference (ref: hybrid/hybridMixMax.py:310-316).

    Returns: [T, F] clean log-magnitude estimate.
    """
    T, F = log_mag.shape
    delta = default_delta(F)
    if posteriors is None:
        posteriors = jnp.broadcast_to(model.prio_p, (T,) + model.prio_p.shape)

    if not track_noise:
        est = jax.vmap(lambda p, z: estimate_frame(model, p, z, delta,
                                                   nn_weighted)[0])
        return est(posteriors, log_mag)

    def step(carry, inp):
        g_mu, g_sigma = carry
        p, z = inp
        m = model._replace(g_mu=g_mu, g_sigma=g_sigma)
        x_hat, rho = estimate_frame(m, p, z, delta, nn_weighted)
        # presence-weighted noise adaptation (ref: hybridMixMax.py:310-316)
        g_mu = rho * g_mu + (1 - rho) * (model.alpha * z + (1 - model.alpha) * g_mu)
        dev = jnp.abs(z - g_mu)
        g_sigma = rho * g_sigma + (1 - rho) * (model.alpha * dev
                                               + (1 - model.alpha) * g_sigma)
        g_sigma = jnp.maximum(g_sigma, 1e-6)
        return (g_mu, g_sigma), x_hat

    _, x_hat = jax.lax.scan(step, (model.g_mu, model.g_sigma),
                            (posteriors, log_mag))
    return x_hat


def gaussians_from_stats(means: np.ndarray, stds: np.ndarray,
                         probs: np.ndarray) -> MixMaxModel:
    """Build a model from per-class statistics, noise initialised from class
    0 like the fork's MagPhonemes wiring (ref: deepxi/inp_tgt.py:988-989)."""
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.maximum(jnp.asarray(stds, jnp.float32), 1e-6)
    return MixMaxModel(x_mu=means, x_sigma=stds, g_mu=means[0],
                       g_sigma=stds[0], prio_p=jnp.asarray(probs, jnp.float32))
