"""Aux subsystem tests: prelim harness, profiling, phoneme lexicon,
spectral-distortion driver, eval_example dump."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


class TestPrelim:
    def test_converges_to_constant_target(self):
        from deepxi_tpu.prelim import run_prelim
        loss, mae = run_prelim(n_steps=60, verbose=False)
        assert mae < 0.12, mae

    def test_other_networks_run(self):
        from deepxi_tpu.prelim import run_prelim
        loss, mae = run_prelim("ResLSTM", n_steps=5, d_model=32, n_blocks=1,
                               verbose=False, d_f=None, k=None, max_d_rate=None,
                               unit_type=None)
        assert np.isfinite(loss)


class TestProfiling:
    def test_stage_timer(self):
        from deepxi_tpu.utils import StageTimer
        t = StageTimer()
        with t.stage("a"):
            x = jnp.ones((64, 64)).sum()
        with t.stage("a", block_on=x):
            pass
        rep = t.report()
        assert "a" in rep and t.counts["a"] == 2
        t.reset()
        assert not t.totals


class TestPhoneme:
    LEX = "/root/reference/hybrid/initialfinal2phoneme-lexicon.txt"

    @pytest.mark.skipif(not os.path.exists(LEX), reason="lexicon not mounted")
    def test_parse_reference_lexicon(self):
        from deepxi_tpu.dsp.phoneme import Phoneme
        ph = Phoneme(self.LEX)
        assert ph.tkn_dict.entry2Index["|"] == 0
        assert "*" in ph.tkn_dict.entry2Index
        # consonant initials are un-toned; vowels toned
        assert "b" in ph.tkn_dict.entry2Index
        assert "a1" in ph.tkn_dict.entry2Index
        # round trip
        idx = ph.tkn_dict.entry2Index["a1"]
        assert ph.tkn_dict.index2Entry[idx] == "a1"
        ids = ph.ids(["b", "a1"])
        assert len(ids) == 2

    def test_parse_synthetic(self, tmp_path):
        from deepxi_tpu.dsp.phoneme import Phoneme
        p = tmp_path / "lex.txt"
        p.write_text("ba | b a\nb  | b\nan | a n\n")
        ph = Phoneme(str(p))
        assert ph.mapping["ba"] == "b a"
        toks = ph.tokens("ba", tone="3")
        assert toks == ["b", "a3"]


class TestSpectralDistortionMetric:
    def test_zero_for_identical(self):
        from deepxi_tpu import sig
        xi = jnp.abs(jnp.asarray(np.random.RandomState(0).randn(20, 257))) + 0.1
        assert float(sig.spectral_distortion(xi, xi)) < 1e-5

    def test_positive_for_different(self):
        from deepxi_tpu import sig
        rng = np.random.RandomState(1)
        a = jnp.abs(jnp.asarray(rng.randn(20, 257))) + 0.1
        b = a * 2.0
        v = float(sig.spectral_distortion(a, b))
        assert abs(v - 10 * np.log10(2.0) * 0 - 3.0103) < 0.01  # uniform 2x = 3.01 dB
