"""Differential tests: the rebuilt DSP stack vs the reference's importable
NumPy implementations, executed from the read-only mount as oracles
(VERDICT round-1 item 2). Identical inputs drive both; agreement is
asserted to documented tolerances, and every deliberate divergence from a
catalogued reference defect is asserted *as* a divergence or documented at
the assertion site.

Oracles: bak/multiphase.py (mcra/mcra_2/imcra/mcra_tbrr),
histogram2quantile/histogram.py, hybrid/hybridMixMax.py, gmmn/gmmnoise.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _ref_oracle import REF, load_oracles

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def oracles():
    return load_oracles()


@pytest.fixture()
def x64():
    """Run a test in float64 so recursion drift does not mask algorithmic
    differences; restored afterwards."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _drive(tracker, pwr, *extra):
    """Run a reference per-frame tracker over [T, F] frames, collecting
    (lambda_d, G, p) trajectories."""
    out = []
    for t in range(pwr.shape[0]):
        args = [pwr[t]] + [e[t] for e in extra] + [t]
        ld, G, p = tracker.tracking_noise(*args)
        out.append((np.squeeze(np.array(ld)).copy(),
                    np.squeeze(np.array(G)).copy(),
                    np.squeeze(np.array(p)).copy()))
    return tuple(np.array(x) for x in zip(*out))


def _periodogram(T, F, seed):
    rng = np.random.RandomState(seed)
    return (np.abs(rng.randn(T, F)) ** 2 + 0.1).astype(np.float64)


class TestMCRAFamily:
    """mcra/mcra_2/mcra_tbrr: frame-recursive noise trackers. The rebuild's
    lax.scan runs in f32; the oracle in f64 -- measured agreement is ~1e-6,
    asserted at 1e-4."""

    F, T = 64, 300

    def test_mcra(self, oracles):
        from deepxi_tpu.dsp.trackers import MCRAParams, mcra_track
        pwr = _periodogram(self.T, self.F, 0)
        orc = oracles["multiphase"].mcra(
            alpha_d=0.95, alpha_s=0.8, alpha_p=0.2, lambda_d=pwr[0],
            frame_L=100, bin_num=self.F, delta=np.float64(5.0))
        ld_r, G_r, p_r = _drive(orc, pwr)
        P = MCRAParams(alpha_d=0.95, alpha_s=0.8, alpha_p=0.2,
                       frame_L=100, delta=5.0)
        ld, G, p = (np.asarray(x) for x in
                    mcra_track(jnp.asarray(pwr, jnp.float32), P))
        np.testing.assert_allclose(ld, ld_r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(G, G_r, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(p, p_r, atol=1e-4)

    def test_mcra2(self, oracles):
        from deepxi_tpu.dsp.trackers import MCRAParams, mcra2_track
        pwr = _periodogram(self.T, self.F, 1)
        orc = oracles["multiphase"].mcra_2(
            alpha_d=0.95, alpha_s=0.8, alpha_p=0.2, lambda_d=pwr[0],
            frame_L=100, fft_len=self.F, delta=np.float64(5.0),
            gamma=0.998, beta=0.96)
        ld_r, G_r, _ = _drive(orc, pwr)
        P = MCRAParams(alpha_d=0.95, alpha_s=0.8, alpha_p=0.2, frame_L=100,
                       delta=5.0, gamma=0.998, beta=0.96)
        ld, G, _ = (np.asarray(x) for x in
                    mcra2_track(jnp.asarray(pwr, jnp.float32), P))
        np.testing.assert_allclose(ld, ld_r, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(G, G_r, rtol=1e-4, atol=1e-4)

    def test_mcra_tbrr(self, oracles):
        from deepxi_tpu.dsp.trackers import MCRAParams, mcra_tbrr_track
        pwr = _periodogram(self.T, self.F, 2)
        pwr_b = _periodogram(self.T, self.F, 3)
        pwr_bm = _periodogram(self.T, self.F, 4)
        orc = oracles["multiphase"].mcra_tbrr(
            alpha_d=0.95, alpha_s=0.8, alpha_p=0.2, lambda_d=pwr[0],
            z_b=pwr_b[0], z_r=pwr_bm[0], frame_L=100, bin_num=self.F,
            delta=np.float64(5.0))
        ld_r, G_r, p_r = _drive(orc, pwr, pwr_b, pwr_bm)
        P = MCRAParams(alpha_d=0.95, alpha_s=0.8, alpha_p=0.2, frame_L=100,
                       delta=5.0)
        ld, G, p = (np.asarray(x) for x in mcra_tbrr_track(
            jnp.asarray(pwr, jnp.float32), jnp.asarray(pwr_b, jnp.float32),
            jnp.asarray(pwr_bm, jnp.float32), P))
        # the TBRR hypothesis tests are hard thresholds on Omega/gamma; f32
        # values landing on the f64 oracle's boundaries flip a handful of
        # cells -- assert near-total agreement instead of element-exactness
        for a, b, tol in ((ld, ld_r, 1e-4), (G, G_r, 1e-3), (p, p_r, 1e-3)):
            close = np.isclose(a, b, rtol=1e-4, atol=tol)
            assert close.mean() > 0.999, close.mean()
        np.testing.assert_allclose(ld, ld_r, rtol=5e-2, atol=1e-3)

    def test_reference_imcra_is_dead_code(self, oracles):
        """CATALOGUED DEFECT: the reference's imcra raises a matmul shape
        error on every input (multiphase.py:220 multiplies the [1,F]
        indicator against the [1,F,F] matrix); the fork only constructs it
        in commented-out code (deepxi/inp_tgt.py:1049-1050). Our
        imcra_track follows Cohen (2003) and runs; the shared MCRA
        machinery is validated by test_mcra above."""
        from deepxi_tpu.dsp.trackers import imcra_track
        pwr = _periodogram(60, self.F, 5)
        orc = oracles["multiphase"].imcra(
            alpha_d=0.89, alpha_s=0.8, alpha_p=0.2, lambda_d=pwr[0],
            frame_L=100, fft_len=self.F, delta=np.float64(5.0), beta=1.23,
            b_min=1.66, gamma0=4.6, gamma1=3.0, zeta0=1.67)
        with pytest.raises(ValueError):
            _drive(orc, pwr)
        ld, G, p = imcra_track(jnp.asarray(pwr, jnp.float32))
        assert np.isfinite(np.asarray(ld)).all()
        assert float(jnp.min(p)) >= 0.0 and float(jnp.max(p)) <= 1.0


class TestHistogramTracker:
    """histogram2quantile/histogram.py oracle, de-aliased.

    CATALOGUED DEFECT (not reproduced): the oracle's warmup assigns
    `self.mean = self.noise` (histogram.py:30,35), permanently ALIASING the
    mode and mean recursions -- every post-warmup noise update also
    overwrites mean before the mean update reads it. The test breaks the
    alias from outside after each step so the recursions run as written.
    Remaining documented divergence: variant 1's exclusion handling
    (`np.squeeze(np.argwhere(..)).any()` is falsy when exactly pool index 0
    is excluded, histogram.py:72 -- those frames use the full pool in the
    oracle); affected cells are asserted rare, everything else exact."""

    F, T = 257, 100

    def _run(self, oracles, pwr):
        h = oracles["histogram"](pwr[0], alpha_d=0.8, alpha_s=0.9,
                                 frame_L=40, fft_len=512, delta=8)
        keys = ("noise", "noise1", "noise2", "mean", "std",
                "mean1", "std1", "mean2", "std2")
        out = {k: [] for k in keys}
        for t in range(self.T):
            h.tracking_noise(pwr[t], t)
            for a in keys:  # de-alias (see class docstring)
                setattr(h, a, np.array(getattr(h, a)).copy())
            for k in keys:
                out[k].append(np.squeeze(np.array(getattr(h, k))).copy())
        return {k: np.array(v) for k, v in out.items()}

    def test_parity(self, oracles, x64):
        from deepxi_tpu.dsp.histnoise import HistParams, histogram_track
        pwr = _periodogram(self.T, self.F, 1) - 0.05
        ref = self._run(oracles, pwr)
        j = histogram_track(jnp.asarray(pwr),
                            HistParams(alpha_d=0.8, alpha_s=0.9, frame_L=40,
                                       delta=8.0, delta_snr=2.5))
        # variant 0 and variant 2 statistics: exact (f64)
        for k in ("noise", "mean", "mean2", "std2"):
            np.testing.assert_allclose(np.asarray(getattr(j, k)), ref[k],
                                       rtol=1e-9, atol=1e-12, err_msg=k)
        # std: exact except the dtype of the eps floor at t<2
        np.testing.assert_allclose(np.asarray(j.std)[2:], ref["std"][2:],
                                   rtol=1e-9, atol=1e-12)
        # variant 1 (+ its noise2 gate): exact outside the oracle's
        # argwhere-index-0 edge case; assert the divergence is rare
        for k in ("noise1", "mean1", "std1", "noise2"):
            a, b = np.asarray(getattr(j, k)), ref[k]
            rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-6)
            frac = float((rel > 1e-9).mean())
            assert frac < 0.005, (k, frac)
            assert float(np.median(rel)) < 1e-12, k


class TestMixMax:
    """hybrid/hybridMixMax.py oracle. Inputs are kept in the
    well-conditioned regime: the oracle exponentiates raw 257-bin pdf
    products (hybridMixMax.py:292-295), which underflow f64 for
    mismatched data -- the catalogued hazard our log-space posteriors
    avoid; parity is asserted where the oracle itself is numerically
    valid."""

    P, F = 6, 257

    def _setup(self, oracles):
        from deepxi_tpu.dsp.mixmax import MixMaxModel
        rng = np.random.RandomState(2)
        base = rng.randn(self.F) * 0.5
        x_mu = base[None] + 0.05 * rng.randn(self.P, self.F)
        x_sigma = np.full((self.P, self.F), 0.2)
        g_mu = (base - 0.5)[None]
        g_sigma = np.full((1, self.F), 0.3)
        prio = np.abs(rng.rand(self.P))
        prio /= prio.sum()
        orc = oracles["hybridMixMax"](x_mu, x_sigma, g_mu, g_sigma, prio,
                                      alpha=0.01, betta=0.99)
        model = MixMaxModel(
            x_mu=jnp.asarray(x_mu, jnp.float64),
            x_sigma=jnp.asarray(x_sigma, jnp.float64),
            g_mu=jnp.asarray(g_mu[0], jnp.float64),
            g_sigma=jnp.asarray(g_sigma[0], jnp.float64),
            prio_p=jnp.asarray(prio, jnp.float64))
        z = base + 0.1 * rng.randn(self.F)
        return orc, model, prio, z, rng

    def test_posterior_stage(self, oracles, x64):
        from deepxi_tpu.dsp.mixmax import _posteriors
        orc, model, prio, z, _ = self._setup(oracles)
        rho_r, R_r, pmm_r = orc.rho_i_k_mixmax(prio, z)
        rho, R, pmm = _posteriors(model, model.prio_p, jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(rho), rho_r, atol=1e-10)
        np.testing.assert_allclose(np.asarray(R), R_r, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(pmm), pmm_r, atol=1e-10)

    def test_estimate_variants(self, oracles, x64):
        from deepxi_tpu.dsp.mixmax import default_delta, estimate_frame
        orc, model, prio, z, rng = self._setup(oracles)
        delta = default_delta(self.F)
        o_r, rho_r = orc.x_estimate_mixmax(prio, z)
        x_hat, rho_bar = estimate_frame(model, model.prio_p,
                                        jnp.asarray(z), delta)
        np.testing.assert_allclose(np.asarray(x_hat), o_r, atol=1e-10)
        np.testing.assert_allclose(np.asarray(rho_bar), rho_r, atol=1e-10)
        post = np.abs(rng.rand(self.P))
        post /= post.sum()
        o_r2, rho_r2 = orc.x_estimate_mixmax_nn(post, z)
        x2, rb2 = estimate_frame(model, jnp.asarray(post), jnp.asarray(z),
                                 delta, nn_weighted=True)
        np.testing.assert_allclose(np.asarray(x2), o_r2, atol=1e-10)
        np.testing.assert_allclose(np.asarray(rb2), rho_r2, atol=1e-10)

    def test_noise_tracking_recursion(self, oracles, x64):
        orc, model, prio, z, rng = self._setup(oracles)
        rho = np.abs(rng.rand(self.F))
        g_mu0 = np.array(orc.g_mu[0])
        g_sig0 = np.array(orc.g_sigma[0])
        orc.tracking_mu_sigma(z, rho)
        # our scan body (mixmax.enhance step) written out explicitly
        g_mu = rho * g_mu0 + (1 - rho) * (0.01 * z + 0.99 * g_mu0)
        dev = np.abs(z - g_mu)
        g_sig = rho * g_sig0 + (1 - rho) * (0.01 * dev + 0.99 * g_sig0)
        np.testing.assert_allclose(np.squeeze(orc.g_mu), g_mu, atol=1e-12)
        np.testing.assert_allclose(np.squeeze(orc.g_sigma), g_sig, atol=1e-12)


class TestVTS:
    """gmmn/gmmnoise.py gmm_phoneme_noise oracle: compensation, joint
    posteriors, and the full EM update, at small F where the oracle's raw
    pdf products stay in range. Its randomised noise-GMM init
    (gmmnoise.py:198-206 evaluates pdfs at random points) is bypassed by
    overriding the attributes with known values on both sides."""

    K, L, F, T = 4, 2, 8, 30

    def _setup(self, oracles):
        from deepxi_tpu.dsp.vts import VTSModel
        rng = np.random.RandomState(3)
        x_mu = rng.randn(self.K, self.F)
        x_var = 0.3 + np.abs(rng.randn(self.K, self.F))
        w_k = np.abs(rng.rand(self.K))
        w_k /= w_k.sum()
        g_mu = rng.randn(self.L, self.F) - 1.0
        g_var = 0.3 + np.abs(rng.randn(self.L, self.F))
        w_l = np.abs(rng.rand(self.L))
        w_l /= w_l.sum()
        np.random.seed(0)  # the oracle's __init__ draws np.random
        orc = oracles["gmmn"].gmm_phoneme_noise(x_mu, x_var, w_k,
                                                g_mu[:1], g_var[:1], self.L)
        orc.g_mu = g_mu[:, None, :]
        orc.g_Sigma = g_var[:, None, :]
        orc.w_nl = w_l[:, None]
        orc.bias = np.zeros(self.F)[None]
        model = VTSModel(
            x_mu=jnp.asarray(x_mu), x_var=jnp.asarray(x_var),
            w_k=jnp.asarray(w_k), g_mu=jnp.asarray(g_mu),
            g_var=jnp.asarray(g_var), w_l=jnp.asarray(w_l),
            bias=jnp.zeros(self.F))
        O = rng.randn(self.T, self.F) * 0.8
        return orc, model, O

    def test_compensation(self, oracles, x64):
        from deepxi_tpu.dsp.vts import compensate
        orc, model, _ = self._setup(oracles)
        orc.compensate_model()
        comp = compensate(model)
        np.testing.assert_allclose(np.asarray(comp.mu_o), orc.mu_okl, atol=1e-12)
        np.testing.assert_allclose(np.asarray(comp.var_o), orc.Sigma_okl, atol=1e-12)
        np.testing.assert_allclose(np.asarray(comp.mismatch_signal),
                                   orc.mismatch_signal, atol=1e-12)
        np.testing.assert_allclose(np.asarray(comp.mismatch_noise),
                                   orc.mismatch_noise, atol=1e-12)

    def test_posteriors_and_em(self, oracles, x64):
        from deepxi_tpu.dsp.vts import compensate, em_step, posteriors
        orc, model, O = self._setup(oracles)
        orc.compensate_model()
        orc.calculate_P_o_t_k_l(O)
        p = np.asarray(posteriors(compensate(model), jnp.asarray(O)))
        np.testing.assert_allclose(p, orc.p_o_t_k_l, atol=1e-12)
        _, noi_r = orc.update_signal_noise(O)
        new, _, noi = em_step(model, jnp.asarray(O))
        np.testing.assert_allclose(np.asarray(noi), noi_r, atol=1e-12)
        np.testing.assert_allclose(np.asarray(new.g_mu),
                                   np.squeeze(orc.g_mu, 1), atol=1e-10)
        np.testing.assert_allclose(np.asarray(new.g_var),
                                   np.squeeze(orc.g_Sigma, 1), atol=1e-10)
        np.testing.assert_allclose(np.asarray(new.w_l),
                                   np.squeeze(orc.w_nl), atol=1e-12)
        np.testing.assert_allclose(np.asarray(new.bias),
                                   np.squeeze(orc.bias), atol=1e-12)
