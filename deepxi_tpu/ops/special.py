"""Device-side special functions.

The reference computes ``exp1`` on the *host* with SciPy inside a TF graph
context (ref: deepxi/gain.py:67), which forces a device round-trip per
utterance. Here everything is a jittable JAX function so the full
enhancement chain stays on the TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rational/series approximations from Abramowitz & Stegun, Handbook of
# Mathematical Functions, eqs. 5.1.53 (series, 0 < x <= 1, |err| < 2e-7) and
# 5.1.56 (rational, x >= 1, |err| < 2e-8 relative) -- public-domain constants.
_E1_SERIES = (-0.57721566, 0.99999193, -0.24991055,
              0.05519968, -0.00976004, 0.00107857)
_E1_NUM = (0.2677737343, 8.6347608925, 18.0590169730, 8.5733287401)
_E1_DEN = (3.9584969228, 21.0996530827, 25.6329561486, 9.5733223454)


def exp1(x: jnp.ndarray) -> jnp.ndarray:
    """Exponential integral E1(x) for x > 0, float32 device implementation.

    Accuracy ~1e-7 absolute for x<=1 and ~2e-8 relative for x>=1, ample for
    the MMSE-LSA gain (ref: deepxi/gain.py:47-69) at float32.
    """
    x = jnp.asarray(x, jnp.float32)
    xs = jnp.maximum(x, 1e-30)  # guard log(0); callers floor nu anyway.

    # Branch 1: series for x <= 1.
    a0, a1, a2, a3, a4, a5 = _E1_SERIES
    small = (-jnp.log(xs) + a0
             + xs * (a1 + xs * (a2 + xs * (a3 + xs * (a4 + xs * a5)))))

    # Branch 2: rational approximation for x >= 1, evaluated in reciprocal
    # powers so x -> inf gives exp1 -> 0 cleanly (no inf/inf; the saturated
    # sigmoid -> erfinv(1) = inf -> xi_hat = inf path reaches here).
    xl = jnp.maximum(x, 1.0)
    r = 1.0 / xl
    num = 1.0 + r * (_E1_NUM[3] + r * (_E1_NUM[2] + r * (_E1_NUM[1] + r * _E1_NUM[0])))
    den = 1.0 + r * (_E1_DEN[3] + r * (_E1_DEN[2] + r * (_E1_DEN[1] + r * _E1_DEN[0])))
    large = jnp.exp(-xl) * r * (num / den)

    return jnp.where(x <= 1.0, small, large)
