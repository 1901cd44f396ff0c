"""Vector-Taylor-Series (VTS) GMM noise model (ref: gmmn/gmmnoise.py:180-558).

Model: in the log-magnitude domain the noisy observation is
o = x + log(1 + exp(n - x - b)) + b, with clean speech x from a K-component
(per-phoneme) diagonal GMM, noise n from an L-component diagonal GMM, and a
channel bias b. First-order VTS compensation gives per-(l, k) observation
Gaussians:

    mu_o    = mu_x + g(mu_n, mu_x, b) + b,    g = log(1 + exp(mu_n - mu_x - b))
    J       = 1 - 1 / (1 + exp(mu_n - mu_x - b))          (d o / d n)
    Sigma_o = (1 - J)^2 Sigma_x + J^2 Sigma_n

EM updates re-estimate the noise GMM and bias from posterior-weighted
pseudo-noise observations, optionally gated by an external speech-presence
probability (ref: gmmnoise.py:321-351 update_signal_noise_spp). Posteriors
are computed in log space (the reference multiplies 257 raw pdfs on the host
and eps-guards the underflow -- a catalogued numerical hazard we avoid).

Batch EM is fully vectorised over frames; `rt_vts_track` is the
frame-recursive variant (ref: gmmnoise.py:354-558) as a `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VTSModel(NamedTuple):
    """Diagonal-covariance GMMs in the log-magnitude domain.

    x_mu/x_var: [K, F] clean speech; g_mu/g_var: [L, F] noise;
    w_k: [K]; w_l: [L]; bias: [F].
    """
    x_mu: jnp.ndarray
    x_var: jnp.ndarray
    w_k: jnp.ndarray
    g_mu: jnp.ndarray
    g_var: jnp.ndarray
    w_l: jnp.ndarray
    bias: jnp.ndarray


def make_model(x_mu, x_sigma, prio_p, g_mu, g_sigma, n_noise_comp: int = 2,
               jitter: float = 0.1, seed: int = 0) -> VTSModel:
    """Build a model from per-phoneme statistics; noise components are
    jittered copies of the initial noise Gaussian (the reference's
    initialisation draws randomised variants, ref: gmmnoise.py:198-206)."""
    x_mu = jnp.asarray(x_mu, jnp.float32)
    x_var = jnp.square(jnp.maximum(jnp.asarray(x_sigma, jnp.float32), 1e-3))
    F = x_mu.shape[-1]
    rng = np.random.RandomState(seed)
    g_mu0 = np.asarray(g_mu, np.float32).reshape(1, F)
    g_var0 = np.square(np.maximum(np.asarray(g_sigma, np.float32), 1e-3)).reshape(1, F)
    g_mu_l = g_mu0 + jitter * rng.randn(n_noise_comp, F).astype(np.float32) \
        * np.sqrt(g_var0)
    g_var_l = np.tile(g_var0, (n_noise_comp, 1))
    return VTSModel(
        x_mu=x_mu, x_var=x_var,
        w_k=jnp.asarray(prio_p, jnp.float32),
        g_mu=jnp.asarray(g_mu_l), g_var=jnp.asarray(g_var_l),
        w_l=jnp.full((n_noise_comp,), 1.0 / n_noise_comp, jnp.float32),
        bias=jnp.zeros((F,), jnp.float32))


def _default_alpha_d(F: int) -> jnp.ndarray:
    """Frequency-dependent subtraction damping (ref: gmmnoise.py:210-215:
    0.3 on the lowest bins rising to 0.78 at high frequencies)."""
    import numpy as _np
    edges = [(7, 0.3), (10, 0.5), (48, 0.65)]
    out = _np.full(F, 0.78, _np.float32)
    i = 0
    for n, v in edges:
        out[i:min(i + n, F)] = v
        i += n
    return jnp.asarray(out)


class Compensated(NamedTuple):
    mu_o: jnp.ndarray        # [L, K, F]
    var_o: jnp.ndarray       # [L, K, F]
    log_w: jnp.ndarray       # [L, K]
    mismatch_signal: jnp.ndarray  # [L, K, F]  g + b      (o - x)
    mismatch_noise: jnp.ndarray   # [L, K, F]  log(1 + exp(-(n-x-b)))  (o - n)


def compensate(model: VTSModel) -> Compensated:
    """First-order VTS model compensation (ref: gmmnoise.py:221-259,347-351)."""
    d = model.g_mu[:, None, :] - model.x_mu[None, :, :] - model.bias
    g = jax.nn.softplus(d)                 # log(1 + exp(d)), stable
    mu_o = model.x_mu[None] + g + model.bias
    J = jax.nn.sigmoid(d)                  # 1 - 1/(1+exp(d))
    var_o = (jnp.square(1.0 - J) * model.x_var[None]
             + jnp.square(J) * model.g_var[:, None, :])
    mismatch_signal = jnp.maximum(g + model.bias, jnp.finfo(jnp.float32).tiny)
    mismatch_noise = jax.nn.softplus(-d)
    log_w = (jnp.log(jnp.maximum(model.w_l, 1e-12))[:, None]
             + jnp.log(jnp.maximum(model.w_k, 1e-12))[None, :])
    return Compensated(mu_o, jnp.maximum(var_o, 1e-8), log_w,
                       mismatch_signal, mismatch_noise)


def posteriors(comp: Compensated, O: jnp.ndarray) -> jnp.ndarray:
    """[T, L, K] joint component posteriors of log-observations O [T, F],
    computed in log space (ref: gmmnoise.py:264-290 calculate_P_o_t_k_l)."""
    diff = O[:, None, None, :] - comp.mu_o[None]
    log_pdf = -0.5 * jnp.sum(jnp.square(diff) / comp.var_o[None]
                             + jnp.log(2.0 * jnp.pi * comp.var_o[None]), axis=-1)
    log_p = comp.log_w[None] + log_pdf
    log_p = log_p - jax.scipy.special.logsumexp(log_p, axis=(1, 2), keepdims=True)
    return jnp.exp(log_p)


def em_step(model: VTSModel, O: jnp.ndarray,
            spp: Optional[jnp.ndarray] = None,
            phoneme_post: Optional[jnp.ndarray] = None,
            update_bias: bool = True
            ) -> Tuple[VTSModel, jnp.ndarray, jnp.ndarray]:
    """One EM iteration over a batch of log-observations.

    Args:
      O: [T, F] noisy log-magnitude frames.
      spp: optional [T, F] speech-presence probability gating the noise
        update (ref: gmmnoise.py:321-345).
      phoneme_post: optional [T, K] external phoneme posteriors replacing the
        model's speech posteriors (hybrid mode, ref: gmmnoise.py:291-296).

    Returns:
      (updated model, signal_hat [T, F], noise_hat [T, F]).
    """
    comp = compensate(model)
    p = posteriors(comp, O)                      # [T, L, K]
    if phoneme_post is not None:
        p_ntl = jnp.sum(p, axis=2)               # [T, L]
        p = p_ntl[:, :, None] * phoneme_post[:, None, :]
    p_ntl = jnp.sum(p, axis=2)                   # [T, L]
    p_stk = jnp.sum(p, axis=1)                   # [T, K]

    # pseudo clean/noise observations (ref: gmmnoise.py:297-345)
    exp_sig = jnp.einsum("tlk,lkf->tf", p, comp.mismatch_signal)
    exp_noi = jnp.einsum("tlk,lkf->tf", p, comp.mismatch_noise)
    if spp is None:
        signal_hat = O - exp_sig
        noise_hat = O - exp_noi
    else:
        # presence-gated, alpha_d-damped subtraction (ref: gmmnoise.py:
        # 321-330): without the damping a speech-absent frame would subtract
        # the full observation (log 0 -> full-scale magnitude on synthesis)
        sap = 1.0 - spp
        alpha_d = _default_alpha_d(O.shape[-1])
        signal_hat = O - alpha_d * (sap * O + spp * exp_sig)
        noise_hat = O - spp * exp_noi

    # noise GMM update
    n_l = jnp.maximum(jnp.sum(p_ntl, axis=0), 1e-8)        # [L]
    w_l = n_l / jnp.sum(n_l)
    g_mu = jnp.einsum("tl,tf->lf", p_ntl, noise_hat) / n_l[:, None]
    ex2 = jnp.einsum("tl,tf->lf", p_ntl, jnp.square(noise_hat)) / n_l[:, None]
    g_var = jnp.maximum(ex2 - jnp.square(g_mu), 1e-6)

    # channel bias: precision-weighted residual (ref: gmmnoise.py:316-319).
    # NOTE: on noise-dominated input, bias and noise level are not jointly
    # identifiable (the reference shares this property); pass
    # update_bias=False to pin the channel.
    if update_bias:
        prec = p_stk[:, :, None] / model.x_var[None]        # [T, K, F]
        num = jnp.sum(prec * (O[:, None, :] - model.x_mu[None]), axis=(0, 1))
        den = jnp.maximum(jnp.sum(prec, axis=(0, 1)), 1e-8)
        bias = num / den
    else:
        bias = model.bias

    new = model._replace(g_mu=g_mu, g_var=g_var, w_l=w_l, bias=bias)
    return new, signal_hat, noise_hat


def vts_enhance(model: VTSModel, O: jnp.ndarray, n_iter: int = 3,
                spp: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, VTSModel]:
    """Batch VTS enhancement: EM-refine the noise model on the utterance,
    return the clean log-magnitude estimate (ref: infer_tracking_noise_vts
    wiring, deepxi/model.py:1465-1782)."""
    signal_hat = O
    for _ in range(n_iter):
        model, signal_hat, _ = em_step(model, O, spp=spp)
    return signal_hat, model


def rt_vts_track(model: VTSModel, O: jnp.ndarray, alpha: float = 0.9
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-recursive VTS (ref: gmmnoise.py:354-558 rt_vts_noise): the noise
    GMM means adapt with an exponential recursion on the per-frame noise
    pseudo-observation. Returns (signal_hat [T, F], noise_mu_traj [T, F])."""

    def step(m: VTSModel, o):
        comp = compensate(m)
        p = posteriors(comp, o[None])[0]                 # [L, K]
        exp_sig = jnp.einsum("lk,lkf->f", p, comp.mismatch_signal)
        exp_noi = jnp.einsum("lk,lkf->f", p, comp.mismatch_noise)
        signal_hat = o - exp_sig
        noise_hat = o - exp_noi
        p_l = jnp.sum(p, axis=1)[:, None]                # [L, 1]
        # convex posterior-gated recursion: effective rate (1-alpha)*p_l,
        # complement stays on the old value (weights sum to 1 per component)
        rate = (1 - alpha) * p_l
        g_mu = (1 - rate) * m.g_mu + rate * noise_hat[None]
        dev = jnp.square(noise_hat[None] - g_mu)
        g_var = jnp.maximum((1 - rate) * m.g_var + rate * dev, 1e-6)
        m = m._replace(g_mu=g_mu, g_var=g_var)
        return m, (signal_hat, jnp.sum(p_l * g_mu, axis=0))

    _, (sig, noi) = jax.lax.scan(step, model, O)
    return sig, noi
