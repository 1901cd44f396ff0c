"""VTS/GMM noise-model tests: compensation math, posteriors, EM convergence,
frame-recursive tracking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.dsp.vts import (compensate, em_step, make_model, posteriors,
                                rt_vts_track, vts_enhance)


def synth_model(K=5, F=32, seed=0):
    rng = np.random.RandomState(seed)
    x_mu = rng.randn(K, F) * 0.5 + 1.0
    x_sigma = np.full((K, F), 0.6)
    prio = np.full(K, 1.0 / K)
    g_mu = np.full((1, F), -2.0)
    g_sigma = np.full((1, F), 0.4)
    return make_model(x_mu, x_sigma, prio, g_mu, g_sigma, n_noise_comp=2)


class TestCompensation:
    def test_shapes_and_limits(self):
        m = synth_model()
        c = compensate(m)
        assert c.mu_o.shape == (2, 5, 32)
        assert c.var_o.shape == (2, 5, 32)
        # speech far above noise: mu_o ~ x_mu, var_o ~ x_var
        np.testing.assert_allclose(np.asarray(c.mu_o[0]),
                                   np.asarray(m.x_mu), atol=0.2)
        # mismatch terms positive
        assert (np.asarray(c.mismatch_signal) > 0).all()
        assert (np.asarray(c.mismatch_noise) >= 0).all()

    def test_noise_dominated_limit(self):
        # when noise >> speech, mu_o ~ g_mu and Jacobian -> 1 so var_o ~ g_var
        m = synth_model()
        m = m._replace(g_mu=m.g_mu + 10.0)
        c = compensate(m)
        np.testing.assert_allclose(np.asarray(c.mu_o[0, 0]),
                                   np.asarray(m.g_mu[0]), atol=0.1)


class TestPosteriors:
    def test_sums_to_one_and_identifies_component(self):
        m = synth_model()
        c = compensate(m)
        # observations drawn at component (k=2) means
        O = jnp.asarray(np.asarray(c.mu_o[0, 2])[None].repeat(4, 0))
        p = posteriors(c, O)
        s = np.asarray(jnp.sum(p, axis=(1, 2)))
        np.testing.assert_allclose(s, 1.0, rtol=1e-5)
        k_hat = np.asarray(jnp.argmax(jnp.sum(p, axis=1), axis=-1))
        assert (k_hat == 2).all()


class TestEM:
    def test_noise_mean_recovered(self):
        # observations follow the generative model o = logaddexp(x, n)
        # (bias pinned: bias/noise level are not jointly identifiable on
        # stationary data -- same as the reference model)
        rng = np.random.RandomState(1)
        m = synth_model()
        K, F, T = 5, 32, 300
        true_noise = 2.0 + 0.3 * np.sin(np.linspace(0, 3, F))
        ks = rng.randint(0, K, T)
        x = np.asarray(m.x_mu)[ks] + rng.randn(T, F) * 0.6
        n = true_noise[None] + rng.randn(T, F) * 0.3
        O = jnp.asarray(np.logaddexp(x, n).astype(np.float32))
        m2 = m
        for _ in range(6):
            m2, sig, noi = em_step(m2, O, update_bias=False)
        est = np.asarray(jnp.einsum("l,lf->f", m2.w_l, m2.g_mu))
        assert np.mean(np.abs(est - true_noise)) < 0.5, est.mean()

    def test_vts_enhance_runs(self):
        m = synth_model()
        rng = np.random.RandomState(2)
        O = jnp.asarray(rng.randn(50, 32).astype(np.float32))
        sig, m2 = vts_enhance(m, O, n_iter=2)
        assert sig.shape == O.shape
        assert np.isfinite(np.asarray(sig)).all()
        # estimator attenuates (log-domain estimate below observation)
        assert float(jnp.mean(sig)) <= float(jnp.mean(O)) + 1e-5

    def test_spp_gating(self):
        m = synth_model()
        rng = np.random.RandomState(3)
        O = jnp.asarray(rng.randn(40, 32).astype(np.float32))
        spp = jnp.ones_like(O) * 0.5
        m2, sig, noi = em_step(m, O, spp=spp)
        assert np.isfinite(np.asarray(sig)).all()
        assert np.isfinite(np.asarray(m2.g_mu)).all()


class TestRT:
    def test_scan_tracking(self):
        m = synth_model()
        rng = np.random.RandomState(4)
        F = 32
        O = jnp.asarray((-1.5 + rng.randn(100, F) * 0.2).astype(np.float32))
        sig, noi = jax.jit(lambda m, O: rt_vts_track(m, O))(m, O)
        assert sig.shape == O.shape and noi.shape == O.shape
        assert np.isfinite(np.asarray(sig)).all()
