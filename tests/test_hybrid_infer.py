"""Hybrid/classical inference-mode tests (the fork's infer_* experiments)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepxi_tpu.dsp.mixmax import gaussians_from_stats
from deepxi_tpu.dsp.vts import make_model
from deepxi_tpu.hybrid_infer import (enhance_mixmax, enhance_omlsa,
                                     enhance_tracking_histogram, enhance_vts)


@pytest.fixture(scope="module")
def noisy():
    rng = np.random.RandomState(0)
    fs = 16000
    t = np.arange(fs * 2) / fs
    s = 0.4 * np.sin(2 * np.pi * 300 * t) * (np.sin(2 * np.pi * 2 * t) > 0)
    x = s + rng.randn(len(s)) * 0.05
    return jnp.asarray((x * 20000).clip(-32767, 32767).astype(np.int16))


class TestHybridModes:
    def test_omlsa(self, noisy):
        y = np.asarray(enhance_omlsa(noisy))
        assert np.isfinite(y).all() and len(y) > len(noisy) - 512
        # attenuates the noise-only tail/segments
        x_f = np.asarray(noisy, np.float32) / 32768.0
        assert np.abs(y[:len(x_f)]).mean() < np.abs(x_f).mean()

    def test_omlsa_imcra_variant(self, noisy):
        y = np.asarray(enhance_omlsa(noisy, tracker="imcra"))
        assert np.isfinite(y).all()

    def test_histogram_tracking(self, noisy):
        y = np.asarray(enhance_tracking_histogram(noisy))
        assert np.isfinite(y).all()

    def test_mixmax(self, noisy):
        rng = np.random.RandomState(1)
        model = gaussians_from_stats(rng.randn(4, 257) * 0.5,
                                     np.full((4, 257), 0.5), np.full(4, 0.25))
        y = np.asarray(enhance_mixmax(noisy, model))
        assert np.isfinite(y).all()

    def test_vts(self, noisy):
        rng = np.random.RandomState(2)
        model = make_model(rng.randn(4, 257) * 0.5, np.full((4, 257), 0.6),
                           np.full(4, 0.25), np.full((1, 257), -3.0),
                           np.full((1, 257), 0.5))
        y = np.asarray(enhance_vts(noisy, model, n_iter=1))
        assert np.isfinite(y).all()
