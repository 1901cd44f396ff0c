"""Map and gain-function parity tests (SURVEY.md section 4: map/inverse-map
idempotence, each gain function against SciPy references)."""

import os

import numpy as np
import pytest
import scipy.special as spsp

import jax.numpy as jnp

from deepxi_tpu.ops import exp1, gfunc, map_selector
from deepxi_tpu.ops import gains as G

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


class TestExp1:
    def test_matches_scipy(self):
        x = np.concatenate([
            np.logspace(-12, 0, 200), np.linspace(1.0, 30.0, 200)]).astype(np.float32)
        ours = np.asarray(exp1(jnp.asarray(x)))
        ref = spsp.exp1(x.astype(np.float64))
        # rtol bounded by float32 rounding of -ln(x) for tiny x.
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=2e-7)


class TestGains:
    def setup_method(self, _):
        rng = np.random.RandomState(0)
        self.xi = (np.abs(rng.randn(64, 257)) ** 2 * 5).astype(np.float32) + 1e-6
        self.gamma = self.xi + 1.0

    def _np_mmse_lsa(self, xi, gamma):
        xi = np.maximum(xi, 1e-12)
        gamma = np.maximum(gamma, 1e-12)
        v1 = xi / (1.0 + xi)
        nu = v1 * gamma
        return v1 * np.exp(0.5 * spsp.exp1(nu))

    def _np_mmse_stsa(self, xi, gamma):
        xi = np.maximum(xi, 1e-12)
        gamma = np.maximum(gamma, 1e-12)
        nu = xi * gamma / (1.0 + xi)
        g = (np.sqrt(np.pi) / 2 * np.sqrt(nu) / gamma * np.exp(-nu / 2)
             * ((1 + nu) * spsp.i0(nu / 2) + nu * spsp.i1(nu / 2)))
        idx = np.isnan(g) | np.isinf(g)
        g[idx] = xi[idx] / (1 + xi[idx])
        return g

    def test_mmse_lsa(self):
        ours = np.asarray(gfunc(jnp.asarray(self.xi), jnp.asarray(self.gamma), "mmse-lsa"))
        ref = self._np_mmse_lsa(self.xi.astype(np.float64), self.gamma.astype(np.float64))
        np.testing.assert_allclose(ours, ref, rtol=2e-4)

    def test_mmse_stsa(self):
        ours = np.asarray(gfunc(jnp.asarray(self.xi), jnp.asarray(self.gamma), "mmse-stsa"))
        ref = self._np_mmse_stsa(self.xi.astype(np.float64), self.gamma.astype(np.float64))
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=1e-6)

    def test_mmse_stsa_wiener_fallback(self):
        # Large nu overflows the Bessel terms -> Wiener fallback
        # (ref: deepxi/gain.py:42-44).
        xi = jnp.asarray([1e8], jnp.float32)
        gamma = jnp.asarray([1e8], jnp.float32)
        out = np.asarray(gfunc(xi, gamma, "mmse-stsa"))
        np.testing.assert_allclose(out, [1e8 / (1 + 1e8)], rtol=1e-6)

    def test_wf_family(self):
        np.testing.assert_allclose(np.asarray(gfunc(jnp.asarray(self.xi), None, "wf")),
                                   self.xi / (1 + self.xi), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gfunc(jnp.asarray(self.xi), None, "srwf")),
                                   np.sqrt(self.xi / (1 + self.xi)), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gfunc(jnp.asarray(self.xi), None, "irm")),
                                   np.sqrt(self.xi / (1 + self.xi)), rtol=1e-6)
        r = np.sqrt(self.xi)
        np.testing.assert_allclose(np.asarray(gfunc(jnp.asarray(self.xi), None, "cwf")),
                                   r / (1 + r), rtol=1e-5)

    def test_ibm(self):
        out = np.asarray(gfunc(jnp.asarray([0.5, 1.5]), None, "ibm"))
        np.testing.assert_array_equal(out, [0.0, 1.0])

    def test_deepmmse(self):
        ours = np.asarray(gfunc(jnp.asarray(self.xi), jnp.asarray(self.gamma), "deepmmse"))
        ref = 1 / (1 + self.xi) + self.xi / (self.gamma * (1 + self.xi))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_dgwf(self):
        cdm = self.xi > 1.0
        ours = np.asarray(gfunc(jnp.asarray(self.xi), None, "dgwf", jnp.asarray(cdm)))
        v1, v2 = 2 / np.pi, 4 / np.pi
        r = np.sqrt(self.xi)
        gm = (self.xi - v1 * r) / (self.xi + 1 - v2 * r)
        gp = (self.xi + v1 * r) / (self.xi + 1 + v2 * r)
        np.testing.assert_allclose(ours, np.where(cdm, gp, gm), rtol=1e-2, atol=1e-6)

    def test_invalid_gain_raises(self):
        with pytest.raises(ValueError):
            gfunc(jnp.asarray(self.xi), None, "nope")


class TestNormalCDFMap:
    def test_stats_and_map_match_tf_golden(self):
        g = np.load(os.path.join(GOLDEN, "normalcdf.npz"))
        m = map_selector("DBNormalCDF", None)
        m = m.with_stats(jnp.asarray(g["xi_sample"]))
        np.testing.assert_allclose(np.asarray(m.mu), g["mu"], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m.sigma), g["sigma"], rtol=1e-4, atol=1e-4)
        xbar = np.asarray(m.map(jnp.asarray(g["xi_sample"])))
        np.testing.assert_allclose(xbar, g["xbar"], atol=2e-5)
        inv = np.asarray(m.inverse(jnp.asarray(g["xbar"])))
        np.testing.assert_allclose(inv, g["inv"], rtol=2e-2, atol=1e-4)

    def test_round_trip(self):
        rng = np.random.RandomState(7)
        sample = (np.abs(rng.randn(256, 33)) ** 2).astype(np.float32) + 1e-3
        m = map_selector("DBNormalCDF", None).with_stats(jnp.asarray(sample))
        x = (np.abs(rng.randn(16, 33)) ** 2).astype(np.float32) + 1e-3
        xbar = m.map(jnp.asarray(x))
        back = np.asarray(m.inverse(xbar))
        np.testing.assert_allclose(back, x, rtol=2e-2, atol=1e-4)


class TestOtherMaps:
    def setup_method(self, _):
        rng = np.random.RandomState(8)
        self.sample = (np.abs(rng.randn(512, 17)) ** 2).astype(np.float32) + 1e-3
        self.x = (np.abs(rng.randn(8, 17)) ** 2).astype(np.float32) + 1e-3

    def _round_trip(self, map_type, params=None, rtol=1e-3):
        m = map_selector(map_type, params).with_stats(jnp.asarray(self.sample))
        xbar = m.map(jnp.asarray(self.x))
        back = np.asarray(m.inverse(xbar))
        np.testing.assert_allclose(back, self.x, rtol=rtol, atol=1e-4)

    def test_linear(self):
        self._round_trip("Linear")

    def test_db(self):
        self._round_trip("DB", rtol=1e-2)

    def test_square(self):
        self._round_trip("Square", rtol=1e-2)

    def test_standardise(self):
        self._round_trip("DBStandardise", rtol=1e-2)

    def test_minmax(self):
        self._round_trip("DBMinMaxScaling", rtol=5e-2)

    def test_logistic(self):
        self._round_trip("DBLogistic", params=[0.1, 0.0], rtol=2e-2)

    def test_laplace_cdf(self):
        self._round_trip("DBLaplaceCDF", params=[0.0], rtol=5e-2)

    def test_truncated_laplace_cdf(self):
        m = map_selector("DBTruncatedLaplaceCDF", [0.0, -40.0, 40.0])
        m = m.with_stats(jnp.asarray(self.sample))
        xbar = np.asarray(m.map(jnp.asarray(self.x)))
        assert np.all(xbar >= 0) and np.all(xbar <= 1)
        back = np.asarray(m.inverse(jnp.asarray(xbar)))
        np.testing.assert_allclose(back, self.x, rtol=5e-2, atol=1e-3)

    def test_uniform_cdf(self):
        m = map_selector("UniformCDF", [0.0, 10.0])
        xbar = m.map(jnp.asarray(self.x))
        back = np.asarray(m.inverse(xbar))
        np.testing.assert_allclose(back, self.x, rtol=1e-5)

    def test_uniform_cdf_default_params(self):
        # Omitted params fall back to [0, 1] (the reference crashes instead,
        # deepxi/map.py:597 — defect not reproduced).
        m = map_selector("UniformCDF", None)
        assert (m.a, m.b) == (0.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(m.map(jnp.asarray([[0.25]]))), [[0.25]])

    def test_clip(self):
        m = map_selector("Clip", [0.0, 1.0])
        out = np.asarray(m.map(jnp.asarray([[-1.0, 0.5, 2.0]])))
        np.testing.assert_allclose(out, [[0.0, 0.5, 1.0]])

    def test_invalid_map_raises(self):
        with pytest.raises(ValueError):
            map_selector("Bogus", None)
