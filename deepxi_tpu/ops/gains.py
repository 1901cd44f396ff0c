"""MMSE/Wiener/mask gain functions (ref: deepxi/gain.py).

All gains are pure jittable JAX functions so the full xi_hat -> gain ->
enhanced-STMS path fuses into one XLA computation on device. The reference
computes MMSE-LSA's exp1 and the `deepmmse`/`cwf`/`dgwf` gains on the host
with SciPy/NumPy (ref: deepxi/gain.py:67,105,118-127,154-166); here they are
device-side.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.special import i0, i1

from deepxi_tpu.ops.special import exp1

_GAIN_FNS = {}

# Upper clamp for SNR inputs: a saturated sigmoid target (xi_bar = 1.0)
# inverts to xi = +inf through erfinv, which would give inf/inf = NaN in the
# Wiener-family gains (the reference NaNs identically there,
# ref: deepxi/gain.py:81). Clamping at 1e12 leaves the gain within 1e-12 of
# 1.0 while keeping the pipeline NaN-free.
XI_MAX = 1e12


def _register(name):
    def deco(fn):
        _GAIN_FNS[name] = fn
        return fn
    return deco


@_register("wf")
def wf(xi, gamma=None):
    """Wiener filter gain xi / (xi + 1) (ref: deepxi/gain.py:71-81)."""
    xi = jnp.minimum(xi, XI_MAX)
    return xi / (xi + 1.0)


@_register("srwf")
def srwf(xi, gamma=None):
    """Square-root Wiener filter (ref: deepxi/gain.py:83-93)."""
    return jnp.sqrt(wf(xi))


@_register("cwf")
def cwf(xi, gamma=None):
    """Constrained Wiener filter: WF evaluated at sqrt(xi) (ref: deepxi/gain.py:95-105)."""
    return wf(jnp.sqrt(xi))


@_register("irm")
def irm(xi, gamma=None):
    """Ideal ratio mask == SRWF (ref: deepxi/gain.py:129-139)."""
    return srwf(xi)


@_register("ibm")
def ibm(xi, gamma=None):
    """Ideal binary mask with a 0 dB threshold (ref: deepxi/gain.py:141-151)."""
    return (xi > 1.0).astype(jnp.float32)


@_register("mmse-stsa")
def mmse_stsa(xi, gamma):
    """MMSE short-time spectral amplitude estimator (Ephraim-Malah), with the
    reference's Wiener fallback where the Bessel terms overflow
    (ref: deepxi/gain.py:13-45)."""
    xi = jnp.clip(xi, 1e-12, XI_MAX)
    gamma = jnp.clip(gamma, 1e-12, XI_MAX)
    nu = xi * (gamma / (1.0 + xi))
    G = ((math.sqrt(math.pi) / 2.0)
         * (jnp.sqrt(nu) / gamma)
         * jnp.exp(-nu / 2.0)
         * ((1.0 + nu) * i0(nu / 2.0) + nu * i1(nu / 2.0)))
    bad = jnp.isnan(G) | jnp.isinf(G)
    return jnp.where(bad, wf(xi), G)


@_register("mmse-lsa")
def mmse_lsa(xi, gamma):
    """MMSE log-spectral amplitude estimator (ref: deepxi/gain.py:47-69),
    with exp1 evaluated on device (deepxi_tpu.ops.special.exp1)."""
    xi = jnp.clip(xi, 1e-12, XI_MAX)
    gamma = jnp.clip(gamma, 1e-12, XI_MAX)
    v = xi / (1.0 + xi)
    nu = v * gamma
    return v * jnp.exp(0.5 * exp1(nu))


@_register("deepmmse")
def deepmmse(xi, gamma):
    """MMSE noise-periodogram gain 1/(1+xi) + xi/(gamma(1+xi))
    (ref: deepxi/gain.py:154-166)."""
    xi = jnp.minimum(xi, XI_MAX)
    gamma = jnp.minimum(gamma, XI_MAX)
    return 1.0 / (1.0 + xi) + xi / (gamma * (1.0 + xi))


@_register("dgwf")
def dgwf(xi, gamma=None, cdm=None):
    """Dual-gain Wiener filter over a constructive/destructive mask
    (ref: deepxi/gain.py:107-127)."""
    v1 = 2.0 / math.pi
    v2 = 2.0 * v1
    r = jnp.sqrt(xi)
    den = xi + 1.0
    g_minus = (xi - v1 * r) / (den - v2 * r)
    g_plus = (xi + v1 * r) / (den + v2 * r)
    return jnp.where(cdm, g_plus, g_minus)


def gfunc(xi, gamma=None, gtype="mmse-lsa", cdm=None):
    """Gain dispatcher (ref: deepxi/gain.py:168-191)."""
    if gtype == "dgwf":
        return dgwf(xi, gamma, cdm)
    try:
        fn = _GAIN_FNS[gtype]
    except KeyError:
        raise ValueError(f"Invalid gain function type: {gtype!r}")
    return fn(xi, gamma)


GAIN_TYPES = tuple(sorted(_GAIN_FNS))
