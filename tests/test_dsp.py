"""Classical-DSP stack tests: noise trackers, histogram tracker, adaptive
filters, ASR features, MixMax estimator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.dsp import (HistParams, MCRAParams, block_nlms,
                            gaussians_from_stats, histogram_track,
                            imcra_track, lms, logfbank, mcra2_track,
                            mcra_track, mfcc, mixmax_enhance, nlms,
                            omlsa_enhance, ssc, fbank)


def noisy_spectrogram(T=300, F=257, seed=0, speech_every=50):
    """Stationary noise floor + sparse speech-like bursts."""
    rng = np.random.RandomState(seed)
    noise_psd = 1.0 + 0.5 * np.sin(np.linspace(0, 3, F))
    pwr = noise_psd[None] * rng.exponential(1.0, (T, F))
    for t0 in range(10, T, speech_every):
        pwr[t0:t0 + 12] += 40.0 * rng.exponential(1.0, (min(12, T - t0), F))
    return jnp.asarray(pwr.astype(np.float32)), noise_psd


class TestMCRAFamily:
    @pytest.mark.parametrize("track", [mcra_track, mcra2_track, imcra_track])
    def test_tracks_noise_floor(self, track):
        pwr, noise_psd = noisy_spectrogram()
        ld, G, p = jax.jit(track)(pwr)
        assert ld.shape == pwr.shape and G.shape == pwr.shape
        est = np.asarray(ld[-1])
        # converged estimate within a factor ~3 of the true floor, far below
        # the speech-burst level (40x)
        ratio = est / noise_psd
        assert np.median(ratio) < 3.0 and np.median(ratio) > 0.2
        assert np.isfinite(np.asarray(G)).all()
        assert (np.asarray(p) >= 0).all() and (np.asarray(p) <= 1.0 + 1e-6).all()

    def test_presence_rises_on_speech(self):
        pwr, _ = noisy_spectrogram()
        _, _, p = jax.jit(mcra_track)(pwr)
        p = np.asarray(p)
        on_speech = p[15:20].mean()
        on_noise = p[45:50].mean()
        assert on_speech > on_noise

    def test_omlsa_attenuates_noise_keeps_speech(self):
        pwr, _ = noisy_spectrogram()
        mag = jnp.sqrt(pwr)
        out = np.asarray(jax.jit(omlsa_enhance)(mag))
        assert out.shape == mag.shape
        m = np.asarray(mag)
        # noise-only frames attenuated strongly; speech frames kept
        assert out[45:50].mean() < 0.5 * m[45:50].mean()
        assert out[12:16].mean() > 0.5 * m[12:16].mean()

    def test_invalid_tracker(self):
        with pytest.raises(ValueError):
            omlsa_enhance(jnp.ones((10, 257)), tracker="bogus")


class TestHistogram:
    def test_tracks_noise_floor(self):
        pwr, noise_psd = noisy_spectrogram(T=200)
        out = jax.jit(histogram_track)(pwr)
        for est in (out.noise, out.noise1, out.noise2):
            e = np.asarray(est[-1])
            assert np.isfinite(e).all()
            # mode-tracking stays near the floor despite 40x bursts
            assert np.median(e / noise_psd) < 4.0

    def test_warmup_is_pool_mean(self):
        pwr, _ = noisy_spectrogram(T=20)
        out = histogram_track(pwr, HistParams(frame_L=40))
        # during warmup all three variants coincide
        np.testing.assert_allclose(np.asarray(out.noise), np.asarray(out.noise1),
                                   rtol=1e-5)


class TestAdaptive:
    def test_nlms_converges(self):
        rng = np.random.RandomState(0)
        x = rng.randn(8000).astype(np.float32)
        h = np.array([0.6, -0.3, 0.2, 0.1], np.float32)
        d = np.convolve(x, h)[: len(x)].astype(np.float32)
        y, e, w = jax.jit(lambda x, d: nlms(x, d, n_taps=8, mu=0.5))(
            jnp.asarray(x), jnp.asarray(d))
        tail_err = float(jnp.mean(jnp.square(e[-1000:])))
        assert tail_err < 1e-4
        np.testing.assert_allclose(np.asarray(w[:4]), h, atol=1e-2)

    def test_lms_and_block(self):
        rng = np.random.RandomState(1)
        x = rng.randn(8192).astype(np.float32)
        d = np.convolve(x, [0.5, 0.25])[: len(x)].astype(np.float32)
        _, e1, _ = lms(jnp.asarray(x), jnp.asarray(d), n_taps=4, mu=0.02)
        _, e2, _ = block_nlms(jnp.asarray(x), jnp.asarray(d), n_taps=4)
        assert float(jnp.mean(jnp.square(e1[-500:]))) < 0.05
        assert float(jnp.mean(jnp.square(e2[-500:]))) < 0.05


class TestFeatures:
    def test_mfcc_shapes_and_dct(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(16000).astype(np.float32))
        c = mfcc(x)
        assert c.shape[-1] == 13
        # frame count: 1 + ceil((16000-400)/160) = 99
        assert c.shape[0] == 99
        assert np.isfinite(np.asarray(c)).all()

    def test_dct_matches_scipy(self):
        from scipy.fft import dct as sdct

        from deepxi_tpu.dsp.features import _dct2_ortho
        x = np.random.RandomState(3).randn(5, 26).astype(np.float32)
        ours = x @ _dct2_ortho(26, 13)
        ref = sdct(x, type=2, axis=-1, norm="ortho")[:, :13]
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_logfbank_and_ssc(self):
        x = jnp.asarray(np.random.RandomState(4).randn(8000).astype(np.float32))
        lf = logfbank(x)
        assert lf.shape[-1] == 26 and np.isfinite(np.asarray(lf)).all()
        s = ssc(x)
        sv = np.asarray(s)
        assert (sv > 0).all() and (sv < 8000).all()

    def test_fbank_energy_positive(self):
        x = jnp.asarray(np.random.RandomState(5).randn(4000).astype(np.float32))
        feat, energy = fbank(x)
        assert (np.asarray(feat) > 0).all() and (np.asarray(energy) > 0).all()


class TestMixMax:
    def test_enhances_towards_clean_means(self):
        rng = np.random.RandomState(6)
        P, F, T = 4, 64, 120
        means = rng.randn(P, F) * 0.5 + 2.0   # clean log-spectra well above noise
        stds = np.full((P, F), 0.5)
        probs = np.full(P, 1.0 / P)
        model = gaussians_from_stats(means, stds, probs)
        model = model._replace(g_mu=jnp.full((F,), -1.0),
                               g_sigma=jnp.full((F,), 0.3))
        # noisy log-spectrum: noise-dominated frames near -1
        z = jnp.asarray(np.full((T, F), -1.0) + rng.randn(T, F) * 0.1,
                        jnp.float32)
        x_hat = mixmax_enhance(model, z, track_noise=False)
        assert x_hat.shape == (T, F)
        # MixMax is an attenuator: z = max(x, g) implies x_hat <= z, floored
        # at z + delta (delta = log 0.03 < 0)
        xh, zz = np.asarray(x_hat), np.asarray(z)
        assert (xh <= zz + 1e-4).all()
        assert (xh >= zz + np.log(0.01) - 1e-4).all()
        # noise-dominated frames are attenuated on average (the attenuation
        # depth depends on the clean-Gaussian hazard rate)
        assert xh.mean() < zz.mean()
        assert np.isfinite(xh).all()

    def test_speech_dominated_passthrough(self):
        rng = np.random.RandomState(7)
        P, F = 3, 32
        model = gaussians_from_stats(rng.randn(P, F) * 0.3,
                                     np.full((P, F), 0.5), np.full(P, 1 / 3))
        model = model._replace(g_mu=jnp.full((F,), -5.0),
                               g_sigma=jnp.full((F,), 0.3))
        z = jnp.asarray(rng.randn(10, F) * 0.3, jnp.float32)  # >> noise
        x_hat = mixmax_enhance(model, z, track_noise=True)
        # with noise far below, rho ~ 1 and the estimate tracks z
        np.testing.assert_allclose(np.asarray(x_hat), np.asarray(z), atol=0.3)


class TestMCRATBRR:
    def test_dual_channel_tracking(self):
        import jax
        from deepxi_tpu.dsp.trackers import mcra_tbrr_track
        pwr, noise_psd = noisy_spectrogram()
        pwr_b, _ = noisy_spectrogram(seed=1)
        pwr_bm, _ = noisy_spectrogram(seed=2, speech_every=10**9)  # noise ref
        ld, G, p = jax.jit(mcra_tbrr_track)(pwr, pwr_b, pwr_bm)
        assert ld.shape == pwr.shape
        assert np.isfinite(np.asarray(ld)).all()
        assert np.isfinite(np.asarray(G)).all()
        pv = np.asarray(p)
        assert (pv >= 0).all() and (pv <= 1.0 + 1e-6).all()
        ratio = np.asarray(ld[-1]) / noise_psd
        assert np.median(ratio) < 5.0


class TestANC:
    def test_cancel_noise(self):
        from deepxi_tpu.dsp.adaptive import cancel_noise
        rng = np.random.RandomState(8)
        ref = rng.randn(8000).astype(np.float32)           # noise reference
        path = np.array([0.8, -0.2, 0.1], np.float32)       # acoustic path
        speech = 0.3 * np.sin(2 * np.pi * 300 * np.arange(8000) / 16000)
        primary = (speech + np.convolve(ref, path)[:8000]).astype(np.float32)
        out = np.asarray(cancel_noise(jnp.asarray(primary), jnp.asarray(ref),
                                      n_taps=8))
        # cleaned tail approaches the speech component: residual noise far
        # below the injected noise power (speech in the error path keeps the
        # filter adapting, so cancellation is strong but not perfect)
        err = out[-2000:] - speech[-2000:]
        noise_pow = np.mean((primary[-2000:] - speech[-2000:]) ** 2)
        assert np.mean(err ** 2) < 0.05
        assert np.mean(err ** 2) < 0.1 * noise_pow
