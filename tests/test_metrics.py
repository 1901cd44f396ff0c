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
