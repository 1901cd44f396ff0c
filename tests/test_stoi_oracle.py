"""Differential validation of metrics/stoi.py against a loop-level
transcription of the reference's stoi.m (the STOI companion of
test_pesq_oracle.py / test_composite_oracle.py).

The oracle (tests/_stoi_m_oracle.py) executes stoi.m's literal loops;
production vectorises everything. Agreement across SNR/length grids pins
every convention: MATLAB hanning, 1:hop:(L-N) framing, silence-removal
overlap-add, snapped third-octave edges, per-band clipped taa_corr.
"""

import numpy as np
import pytest

import importlib

stoi_mod = importlib.import_module("deepxi_tpu.metrics.stoi")

from _stoi_m_oracle import oracle_stoi

F_S10 = 10000


def _speech_like(n, fs, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(n) / fs
    f0 = 110.0 + 25.0 * np.sin(2 * np.pi * 1.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(0.5 / k * np.sin(k * phase) for k in range(1, 7))
    # syllabic gaps so removeSilentFrames actually drops frames
    x *= (np.sin(2 * np.pi * 2.5 * t) > -0.3).astype(np.float64)
    x += 0.01 * rs.randn(n)
    return 0.3 * x / np.max(np.abs(x))


@pytest.mark.parametrize("snr_db,n,seed", [(20.0, 30000, 1), (5.0, 42000, 2),
                                           (0.0, 25000, 3), (-5.0, 36000, 4)])
def test_stoi_matches_oracle_at_10k(snr_db, n, seed):
    c = _speech_like(n, F_S10, seed)
    d = np.random.RandomState(seed + 90).randn(n)
    d *= np.sqrt(np.sum(c ** 2) / (np.sum(d ** 2) * 10 ** (snr_db / 10)))
    y = c + d
    got = stoi_mod.stoi(c, y, F_S10)
    want = oracle_stoi(c, y)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_stoi_matches_oracle_after_shared_resample():
    """16 kHz input: both paths go through the production resampler (the
    MATLAB polyphase filter itself is out of the transcription's scope --
    see the oracle's module note), pinning everything downstream."""
    fs = 16000
    c = _speech_like(48000, fs, 7)
    d = np.random.RandomState(97).randn(len(c))
    d *= np.sqrt(np.sum(c ** 2) / (np.sum(d ** 2) * 10 ** (10.0 / 10)))
    y = c + d
    got = stoi_mod.stoi(c, y, fs)
    c10 = stoi_mod._resample(c, fs)
    y10 = stoi_mod._resample(y, fs)
    want = oracle_stoi(c10, y10)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_clean_equals_one():
    c = _speech_like(30000, F_S10, 11)
    assert oracle_stoi(c, c) == pytest.approx(1.0, abs=1e-9)
    assert stoi_mod.stoi(c, c, F_S10) == pytest.approx(1.0, abs=1e-9)
