"""Signal-core parity tests against tf.signal golden fixtures
(SURVEY.md section 4: STFT/iSTFT round-trip + golden-file parity)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu import sig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    return np.load(os.path.join(GOLDEN, name))


class TestWindow:
    def test_hamming_matches_tf(self):
        g = _load("stft.npz")
        w = np.asarray(sig.hamming_window(512))
        np.testing.assert_allclose(w, g["window"], rtol=0, atol=1e-6)


class TestSTFT:
    def test_stft_matches_tf_single(self):
        g = _load("stft.npz")
        X = np.asarray(sig.stft(jnp.asarray(g["x1"]), 512, 256, 512))
        ref = g["X1_re"] + 1j * g["X1_im"]
        assert X.shape == ref.shape
        np.testing.assert_allclose(X, ref, rtol=0, atol=2e-3)

    def test_stft_matches_tf_batch(self):
        g = _load("stft.npz")
        X = np.asarray(sig.stft(jnp.asarray(g["x2"]), 512, 256, 512))
        ref = g["X2_re"] + 1j * g["X2_im"]
        assert X.shape == ref.shape
        np.testing.assert_allclose(X, ref, rtol=0, atol=2e-3)

    def test_inverse_stft_matches_tf(self):
        g = _load("stft.npz")
        X = jnp.asarray(g["X1_re"] + 1j * g["X1_im"])
        y = np.asarray(sig.inverse_stft(X, 512, 256, 512))
        assert y.shape == g["y1"].shape
        np.testing.assert_allclose(y, g["y1"], rtol=0, atol=1e-5)

    def test_polar_round_trip(self):
        rng = np.random.RandomState(3)
        x = rng.randn(9000).astype(np.float32)
        mag, pha = sig.polar_analysis(jnp.asarray(x), 512, 256, 512)
        y = np.asarray(sig.polar_synthesis(mag, pha, 512, 256, 512))
        # COLA reconstruction is exact in the interior (first/last frames are
        # attenuated by the padding of the synthesis normalisation).
        np.testing.assert_allclose(y[512:8500], x[512:8500], atol=1e-3)

    def test_n_frames_ceil(self):
        assert sig.n_frames(7000, 256) == 28
        assert sig.n_frames(256, 256) == 1
        assert sig.n_frames(257, 256) == 2

    def test_frame_count_matches_n_frames(self):
        # tf.signal.stft(pad_end=True) yields exactly ceil(len/N_s) frames,
        # the invariant the reference's model relies on (ref: deepxi/sig.py:201-212).
        for n in [5000, 5120, 7000]:
            x = jnp.zeros((n,))
            X = sig.stft(x, 512, 256, 512)
            assert X.shape[0] == sig.n_frames(n, 256)


class TestSTDCT:
    def test_stdct_matches_reference(self):
        g = _load("stdct.npz")
        S = np.asarray(sig.stdct(jnp.asarray(g["x"]), 512, 256, 512))
        np.testing.assert_allclose(S, g["S"], rtol=0, atol=2e-3)

    def test_inverse_stdct_matches_reference(self):
        g = _load("stdct.npz")
        y = np.asarray(sig.inverse_stdct(jnp.asarray(g["S"]), 512, 256, 512))
        np.testing.assert_allclose(y, g["y"], rtol=0, atol=2e-2)


class TestMix:
    def test_add_noise_hits_target_snr(self):
        # The reference's own executable check (ref: deepxi/model.py:185-192).
        rng = np.random.RandomState(4)
        key = jax.random.PRNGKey(0)
        s = rng.randn(4, 6000).astype(np.float32)
        d = rng.randn(4, 16000).astype(np.float32)
        s_len = np.array([6000, 5000, 4000, 3000], np.int32)
        d_len = np.array([16000] * 4, np.int32)
        snr = np.array([-5, 0, 5, 15], np.float32)
        for i in range(4):
            s[i, s_len[i]:] = 0
        x, s_m, d_m = sig.add_noise_batch(key, jnp.asarray(s), jnp.asarray(d),
                                          jnp.asarray(s_len), jnp.asarray(d_len),
                                          jnp.asarray(snr))
        for i in range(4):
            actual = float(sig.snr_db(s_m[i, :s_len[i]], d_m[i, :s_len[i]]))
            assert abs(actual - snr[i]) < 0.01, (i, actual, snr[i])
            np.testing.assert_allclose(np.asarray(x[i]),
                                       np.asarray(s_m[i] + d_m[i]), atol=1e-6)
            # zero beyond the valid prefix
            assert np.all(np.asarray(x[i, s_len[i]:]) == 0)

    def test_xi_gamma_floors(self):
        S = jnp.asarray([[1.0, 0.0]])
        D = jnp.asarray([[0.0, 2.0]])
        v = np.asarray(sig.xi(S, D))
        np.testing.assert_allclose(v, [[1e12, 0.0]])
        g = np.asarray(sig.gamma(jnp.asarray([[3.0, 0.0]]), D))
        np.testing.assert_allclose(g, [[9e12, 0.0]])


class TestMel:
    def test_matches_reference_bank(self):
        g = _load("mel.npz")
        H = sig.mel_filter_bank(40, 512, 16000)
        np.testing.assert_allclose(H, g["H"], rtol=0, atol=1e-6)
