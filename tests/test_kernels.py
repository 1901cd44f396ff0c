"""Spectral kernel tests: matmul-DFT vs FFT path, Pallas kernels
(interpreted on CPU), fused enhancement pipeline equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu import sig
from deepxi_tpu.ops.kernels import (apply_gain_reim, enhance_frames_pallas,
                                    stft_mag, stft_mag_pallas, stft_reim,
                                    synthesis_from_reim)
from deepxi_tpu.sig.stft import n_frames, overlap_and_add

N_d, N_s, K = 512, 256, 512


@pytest.fixture(scope="module")
def wav():
    rng = np.random.RandomState(0)
    return jnp.asarray((rng.randn(2, 20000) * 0.1).astype(np.float32))


class TestMatmulDFT:
    def test_stft_mag_matches_fft(self, wav):
        ref = jnp.abs(sig.stft(wav, N_d, N_s, K))
        out = stft_mag(wav, N_d, N_s, K)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_reim_matches_fft(self, wav):
        X = sig.stft(wav, N_d, N_s, K)
        Y = stft_reim(wav, N_d, N_s, K)
        nb = K // 2 + 1
        np.testing.assert_allclose(np.asarray(Y[..., :nb]), np.real(np.asarray(X)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(Y[..., nb:]), np.imag(np.asarray(X)), atol=1e-4)

    def test_gain_synthesis_matches_polar(self, wav):
        mag, pha = sig.polar_analysis(wav, N_d, N_s, K)
        T = mag.shape[1]
        rng = np.random.RandomState(1)
        G = jnp.asarray(rng.uniform(0.1, 1.0, mag.shape).astype(np.float32))
        y_ref = sig.polar_synthesis(mag * G, pha, N_d, N_s, K)
        Y = stft_reim(wav, N_d, N_s, K)
        y = synthesis_from_reim(apply_gain_reim(Y, G, K), N_d, N_s, K)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)


class TestPallasKernels:
    def test_stft_mag_pallas(self, wav):
        T = n_frames(wav.shape[-1], N_s)
        pad = (T + 1) * N_s - wav.shape[-1]
        x2d = jnp.pad(wav, ((0, 0), (0, pad))).reshape(wav.shape[0], T + 1, N_s)
        ref = jnp.abs(sig.stft(wav, N_d, N_s, K))
        out = stft_mag_pallas(x2d, N_d, K)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_enhance_frames_pallas(self, wav):
        mag, pha = sig.polar_analysis(wav, N_d, N_s, K)
        rng = np.random.RandomState(2)
        G = jnp.asarray(rng.uniform(0.1, 1.0, mag.shape).astype(np.float32))
        y_ref = sig.polar_synthesis(mag * G, pha, N_d, N_s, K)
        Y = stft_reim(wav, N_d, N_s, K)
        fr = enhance_frames_pallas(Y, G, N_d, N_s, K)
        y = overlap_and_add(fr, N_s)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)


class TestFusedEnhancer:
    def test_matches_reference_path(self):
        from deepxi_tpu.enhance import make_enhancer
        from deepxi_tpu.inp_tgt import inp_tgt_selector
        from deepxi_tpu.models import network_selector

        it = inp_tgt_selector("MagXi", N_d=N_d, N_s=N_s, K=K, f_s=16000,
                              map_type="DBNormalCDF", map_params=None)
        sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2).astype(np.float32)
        it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
        net = network_selector("ResNetV2", 257, d_model=32, n_blocks=2, d_f=16,
                               k=3, max_d_rate=2, causal=True,
                               unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
        rng = np.random.RandomState(1)
        x = (rng.randn(2, 8192) * 3000).astype(np.int16)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 257)))

        enhance = make_enhancer(it, net, "mmse-lsa")
        y_fast = np.asarray(enhance(params, jnp.asarray(x)))

        mag, pha = it.observation(jnp.asarray(x))
        tgt = net.apply(params, mag)
        y_ref = np.asarray(it.enhanced_speech(mag, pha, tgt, "mmse-lsa"))
        np.testing.assert_allclose(y_fast, y_ref, atol=1e-5)

    def test_magmag_fast_matches_slow_at_zero_bins(self):
        """MagMag replaces the magnitude outright; at |X| == 0 frames the
        slow path uses atan2(0, 0) = 0 phase, i.e. unit vector (1, 0). The
        fast path must match there too (round-1 advisor finding: the old
        gain form silently zeroed those bins)."""
        from deepxi_tpu.enhance import make_enhancer
        from deepxi_tpu.inp_tgt import inp_tgt_selector
        from deepxi_tpu.models import network_selector

        it = inp_tgt_selector("MagMag", N_d=N_d, N_s=N_s, K=K, f_s=16000,
                              map_type="DBNormalCDF", map_params=None)
        sample = (np.abs(np.random.RandomState(0).randn(64, 257)) + 0.1
                  ).astype(np.float32)
        it = it.replace(mag_map=it.mag_map.with_stats(jnp.asarray(sample)))
        net = network_selector("ResNetV2", 257, d_model=32, n_blocks=2, d_f=16,
                               k=3, max_d_rate=2, causal=True,
                               unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
        rng = np.random.RandomState(3)
        x = (rng.randn(1, 8192) * 3000).astype(np.int16)
        x[:, :4096] = 0  # exact-zero frames -> |X| == 0 bins
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 257)))

        y_fast = np.asarray(make_enhancer(it, net)(params, jnp.asarray(x)))
        mag, pha = it.observation(jnp.asarray(x))
        tgt = net.apply(params, mag)
        y_ref = np.asarray(it.enhanced_speech(mag, pha, tgt))
        assert np.abs(y_ref[:, : 8 * N_s]).max() > 0  # zero region synthesised
        np.testing.assert_allclose(y_fast, y_ref, atol=1e-5)

    def test_golden_chain_parity(self):
        """Fast path reproduces the shipped enhanced wav from the shipped
        xi_hat dump, like the polar path does (tests/test_parity_artifacts)."""
        import os
        REF = "/root/reference"
        if not os.path.isdir(REF):
            pytest.skip("reference not mounted")
        from scipy.io import loadmat

        from deepxi_tpu.data.wavio import read_wav
        from deepxi_tpu.ops import gfunc

        x_i16, _ = read_wav(f"{REF}/set/test_noisy_speech/FB_FB10_07_voice-babble_5dB.wav")
        x = jnp.asarray(x_i16.astype(np.float32) / 32768.0)[None]
        xi_hat = loadmat(f"{REF}/out/resnet-1.0c/e180/xi_hat/FB_FB10_07_voice-babble_5dB.mat")["xi_hat"]
        T = xi_hat.shape[0]
        G = gfunc(jnp.asarray(xi_hat), jnp.asarray(xi_hat) + 1.0, "mmse-lsa")[None]
        Y = stft_reim(x, N_d, N_s, K)[:, :T]
        y = np.asarray(synthesis_from_reim(apply_gain_reim(Y, G, K), N_d, N_s, K))[0]
        y_i16 = (y * 32768.0).astype(np.int16)
        ref_i16, _ = read_wav(f"{REF}/out/resnet-1.0c/e180/y/mmse-lsa/FB_FB10_07_voice-babble_5dB.wav")
        n = min(len(y_i16), len(ref_i16))
        diff = y_i16[:n].astype(np.int32) - ref_i16[:n].astype(np.int32)
        assert np.abs(diff).max() <= 1
