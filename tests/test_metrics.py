"""Objective-metric sanity tests (L7)."""

import numpy as np
import pytest

from deepxi_tpu.metrics import composite, llr, seg_snr, snr_overall, stoi, wss


def speechlike(n=32000, fs=16000, seed=0, gated=False):
    """Broadband envelope-modulated noise: every third-octave band carries
    energy, which is what STOI's band correlations assume of real speech."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    x = rng.randn(n)
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t)
    if gated:
        env = np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)
    return (x * env * 0.3).astype(np.float64)


class TestSTOI:
    def test_identity_is_one(self):
        x = speechlike()
        assert stoi(x, x, 16000) > 0.999
        assert stoi(x, x, 16000, extended=True) > 0.999

    def test_monotonic_with_noise(self):
        x = speechlike()
        rng = np.random.RandomState(1)
        noise = rng.randn(len(x))
        vals = []
        for snr_db in [20, 5, -5]:
            alpha = np.sqrt(np.mean(x ** 2) / (10 ** (snr_db / 10) * np.mean(noise ** 2)))
            vals.append(stoi(x, x + alpha * noise, 16000))
        assert vals[0] > vals[1] > vals[2]
        assert vals[0] > 0.9 and vals[2] < 0.8

    def test_estoi_monotonic(self):
        x = speechlike()
        rng = np.random.RandomState(2)
        noise = rng.randn(len(x))
        v_hi = stoi(x, x + 0.01 * noise, 16000, extended=True)
        v_lo = stoi(x, x + 0.5 * noise, 16000, extended=True)
        assert v_hi > v_lo


class TestQuality:
    def test_segsnr_identity_clamped(self):
        # non-silent signal: every frame clamps at the +35 dB ceiling
        x = speechlike()
        assert seg_snr(x, x, 16000) == pytest.approx(35.0)

    def test_segsnr_identity_with_silence(self):
        # silent frames contribute 10log10(eps/eps)=0 dB, matching the MATLAB
        # comp_snr.m convention (identity < 35 when silence exists)
        x = speechlike(gated=True)
        v = seg_snr(x, x, 16000)
        assert 0.0 < v < 35.0

    def test_segsnr_decreases_with_noise(self):
        x = speechlike()
        rng = np.random.RandomState(3)
        n = rng.randn(len(x)) * 0.05
        assert seg_snr(x, x + n, 16000) < 35.0

    def test_snr_overall(self):
        x = speechlike()
        rng = np.random.RandomState(4)
        noise = rng.randn(len(x))
        alpha = np.sqrt(np.mean(x ** 2) / (10 ** (1.0) * np.mean(noise ** 2)))
        v = snr_overall(x, x + alpha * noise)
        assert abs(v - 10.0) < 0.5

    def test_llr_identity_zero(self):
        x = speechlike()
        assert abs(llr(x, x, 16000)) < 1e-6

    def test_wss_identity_zero(self):
        x = speechlike()
        assert wss(x, x, 16000) < 1e-9

    def test_composite_keys(self):
        x = speechlike()
        y = x + np.random.RandomState(5).randn(len(x)) * 0.02
        out = composite(x, y, 16000, pesq_mos=2.5)
        for k in ("SegSNR", "LLR", "WSS", "SNR", "CSIG", "CBAK", "COVL", "PESQ"):
            assert k in out
        assert 1.0 <= out["CSIG"] <= 5.0
        assert 1.0 <= out["CBAK"] <= 5.0

    def test_composite_regression_formulae(self):
        # exact Hu & Loizou coefficients (composite.m:72-79) on known inputs
        x = speechlike()
        y = x + np.random.RandomState(6).randn(len(x)) * 0.01
        out = composite(x, y, 16000, pesq_mos=3.0)
        csig = np.clip(3.093 - 1.029 * out["LLR"] + 0.603 * 3.0
                       - 0.009 * out["WSS"], 1, 5)
        assert out["CSIG"] == pytest.approx(float(csig))


class TestCompositeRealSpeech:
    """Composite suite on the shipped clean/noisy/enhanced triple: the
    5 dB noisy file must score SNR == 5.0 dB exactly (validating both the
    scorer and the reference's mixing), and enhancement must improve every
    composite measure."""

    REF = "/root/reference"

    @pytest.mark.skipif(not __import__("os").path.isdir(REF),
                        reason="reference not mounted")
    def test_shipped_triple_plausible(self):
        from deepxi_tpu.data.wavio import read_wav
        s, _ = read_wav(f"{self.REF}/set/test_clean_speech/FB_FB10_07_voice-babble.wav")
        x, _ = read_wav(f"{self.REF}/set/test_noisy_speech/FB_FB10_07_voice-babble_5dB.wav")
        y, _ = read_wav(f"{self.REF}/out/resnet-1.1c/e200/y/mmse-lsa/FB_FB10_07_voice-babble_5dB.wav")
        n = min(len(s), len(x), len(y))
        s, x, y = (w[:n].astype(np.float64) / 32768 for w in (s, x, y))
        noisy = composite(s, x, 16000)
        enh = composite(s, y, 16000)
        assert noisy["SNR"] == pytest.approx(5.0, abs=0.05)
        for m in ("CSIG", "CBAK", "COVL", "PESQ", "SegSNR", "SNR"):
            assert enh[m] > noisy[m], m
        assert enh["LLR"] < noisy["LLR"] and enh["WSS"] < noisy["WSS"]
        # plausible single-utterance ranges at 5 dB babble
        assert 1.2 < noisy["PESQ"] < 2.2 and 1.9 < enh["PESQ"] < 3.0
        assert 3.0 < enh["CSIG"] < 4.5 and 2.3 < enh["CBAK"] < 3.6


class TestQualityInternals:
    """Numerical cross-checks of the MATLAB-transcribed helpers against
    independent linear-algebra formulations."""

    def test_levinson_matches_toeplitz_solve(self):
        from scipy.linalg import solve_toeplitz

        from deepxi_tpu.metrics.quality import _autocorr, _levinson_batch
        rng = np.random.RandomState(0)
        frames = rng.randn(5, 480)
        R = _autocorr(frames, 16)
        A = _levinson_batch(R, 16)
        for f in range(5):
            a_ref = solve_toeplitz((R[f, :-1], R[f, :-1]), R[f, 1:])
            np.testing.assert_allclose(A[f], np.r_[1.0, -a_ref], rtol=1e-8)

    def test_quad_toeplitz_matches_dense(self):
        from scipy.linalg import toeplitz

        from deepxi_tpu.metrics.quality import _quad_toeplitz
        rng = np.random.RandomState(1)
        A = rng.randn(4, 17)
        R = rng.randn(4, 17)
        ref = np.array([A[f] @ toeplitz(R[f]) @ A[f] for f in range(4)])
        np.testing.assert_allclose(_quad_toeplitz(A, R), ref, rtol=1e-10)

    def test_frame_count_matlab_convention(self):
        # floor(n/hop - win/hop): n = 600 @ fs 16k (win 480, hop 120) gives
        # exactly ONE frame (the MATLAB loop excludes the last fitting one)
        from deepxi_tpu.metrics.quality import _framed
        assert _framed(np.ones(600), 16000).shape[0] == 1
        assert _framed(np.ones(599), 16000).shape[0] == 0
        assert _framed(np.ones(720), 16000).shape[0] == 2

    def test_llr_positive_for_spectral_mismatch(self):
        # whitened residual vs strongly coloured clean: A_e fits badly
        rng = np.random.RandomState(2)
        n = 32000
        x = np.convolve(rng.randn(n), np.ones(8) / 8, mode="same")
        y = rng.randn(n)
        assert llr(x, y, 16000) > 0.5


class TestDegenerateSignals:
    """A silent/degenerate enhanced output must not kill a campaign
    scoring pass: PESQ (P.862 undefined on silence) raises ValueError,
    score_utterance skips the PESQ-derived metrics and keeps the pure
    signal ones (found when a freshly-trained MagSMM produced an all-zero
    utterance mid-campaign)."""

    def test_zero_enhanced_scores_gracefully(self):
        import warnings

        from deepxi_tpu.metrics.scoring import score_utterance

        rng = np.random.RandomState(0)
        s = rng.randn(32000) * 0.1
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = score_utterance(s, np.zeros(32000), 16000)
        assert "PESQ" not in out and "CSIG" not in out
        for k in ("SegSNR", "SNR", "STOI"):
            assert k in out and np.isfinite(out[k])
