"""MagPhonemes family + alignment label utilities tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.dsp.labels import frame_labels, one_hot_targets, read_alignment
from deepxi_tpu.inp_tgt import inp_tgt_selector

DIMS = dict(N_d=512, N_s=256, K=512, f_s=16000)


class TestLabels:
    def test_read_alignment(self, tmp_path):
        p = tmp_path / "out.ali"
        p.write_text("utt_001\n0.00 0.10 sil\n0.10 0.25 b\n0.25 0.40 a1\n"
                     "0.40 0.45 $0\n.\nutt_002\n0.00 0.30 sil\n.\n")
        ali = read_alignment(str(p))
        assert set(ali) == {"utt_001", "utt_002"}
        assert ali["utt_001"] == [(0.0, 0.10, "sil"), (0.10, 0.25, "b"),
                                  (0.25, 0.40, "a1")]  # $0 skipped

    def test_frame_labels_and_one_hot(self):
        e2i = {"sil": 0, "b": 1, "a1": 2}
        segs = [(0.0, 0.10, "sil"), (0.10, 0.25, "b"), (0.25, 0.40, "a1")]
        lbl = frame_labels(segs, 40, e2i)
        assert lbl[5] == 0 and lbl[15] == 1 and lbl[30] == 2
        oh = one_hot_targets(lbl, 3)
        assert oh.shape == (40, 3)
        np.testing.assert_allclose(oh.sum(-1), 1.0)


class TestMagPhonemes:
    def test_example_and_shapes(self):
        it = inp_tgt_selector("MagPhonemes", **DIMS, Noutp=10)
        assert it.n_outp == 10 and it.n_feat == 257
        rng = np.random.RandomState(0)
        s = (rng.randn(2, 5120) * 3000).astype(np.int16)
        d = (rng.randn(2, 10240) * 2000).astype(np.int16)
        labels = jnp.asarray(rng.randint(0, 10, (2, 20)), jnp.int32)
        inp, tgt, nf = it.example(jax.random.PRNGKey(0), jnp.asarray(s),
                                  jnp.asarray(d),
                                  jnp.asarray([5120, 5120], jnp.int32),
                                  jnp.asarray([10240, 10240], jnp.int32),
                                  jnp.asarray([5.0, 0.0]), labels=labels)
        assert inp.shape == (2, 20, 257) and tgt.shape == (2, 20, 10)
        np.testing.assert_allclose(np.asarray(tgt).sum(-1), 1.0)

    def test_fork_typo_accepted(self):
        it = inp_tgt_selector("MagPhonme", **DIMS, Noutp=5)
        assert it.n_outp == 5

    def test_omlsa_synthesis(self):
        it = inp_tgt_selector("MagPhonemes", **DIMS, Noutp=10)
        rng = np.random.RandomState(1)
        x = (rng.randn(20000) * 3000).astype(np.int16)
        mag, pha = it.observation(jnp.asarray(x))
        y = it.enhanced_speech(mag, pha, None, "omlsa")
        assert np.isfinite(np.asarray(y)).all()
        # OM-LSA attenuates stationary noise
        assert float(jnp.mean(jnp.abs(y))) < float(jnp.mean(jnp.abs(
            it.polar_synthesis(mag, pha))))

    def test_mixmax_synthesis(self):
        from deepxi_tpu.dsp.mixmax import gaussians_from_stats
        rng = np.random.RandomState(2)
        P, F = 4, 257
        model = gaussians_from_stats(rng.randn(P, F), np.full((P, F), 0.5),
                                     np.full(P, 1 / P))
        it = inp_tgt_selector("MagPhonemes", **DIMS, Noutp=P)
        it = it.replace(mixmax_model=model)
        x = (rng.randn(8000) * 3000).astype(np.int16)
        mag, pha = it.observation(jnp.asarray(x))
        post = jnp.asarray(np.full((mag.shape[0], P), 1 / P, np.float32))
        y = it.enhanced_speech(mag, pha, post, "mixmax")
        assert np.isfinite(np.asarray(y)).all()

    def test_invalid_gtype(self):
        it = inp_tgt_selector("MagPhonemes", **DIMS, Noutp=4)
        with pytest.raises(ValueError):
            it.enhanced_speech(jnp.ones((4, 257)), jnp.zeros((4, 257)), None,
                               "mmse-lsa")
