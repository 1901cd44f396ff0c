"""MagPhonemes family + alignment label utilities tests."""

import os

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


class TestPhonemeTraining:
    def test_labelled_list_loader_and_train_step(self, tmp_path):
        """End-to-end phoneme-classifier training: alignment file ->
        labelled list -> labelled loader -> phoneme train step; loss drops."""
        from deepxi_tpu.data import MiniBatchLoader, batch_list_labelled, save_wav
        from deepxi_tpu.models import network_selector
        from deepxi_tpu.training import (TrainState, make_optimizer,
                                         make_phoneme_train_step)

        fs = 16000
        rng = np.random.RandomState(0)
        lex = tmp_path / "lex.txt"
        lex.write_text("b  | b\nan | a n\n")
        wav_dir = tmp_path / "wavs"
        ali_lines = []
        for i in range(4):
            n = 8192 + 1024 * i
            save_wav(str(wav_dir / f"u{i}.wav"),
                     (rng.randn(n) * 3000).astype(np.int16), fs)
            dur = n / fs
            ali_lines.append(f"u{i}\n0.00 {dur/2:.2f} b\n{dur/2:.2f} {dur:.2f} a1\n.")
        ali = tmp_path / "out.ali"
        ali.write_text("\n".join(ali_lines) + "\n")

        items = batch_list_labelled(str(wav_dir), str(ali), str(lex), "pho",
                                    data_path=str(tmp_path / "data"))
        assert len(items) == 4 and "labels" in items[0]

        noise = [{"file_path": str(wav_dir / "u3.wav"), "wav_len": 8192 + 3072}]
        loader = MiniBatchLoader(items, noise, 2, [0, 5], with_labels=True)
        batch = loader._load_batch(items[:2])
        assert len(batch) == 6
        s, d, s_len, d_len, snr, labels = batch
        assert labels.shape[1] == s.shape[1] // 256

        from deepxi_tpu.inp_tgt import inp_tgt_selector
        n_pho = 12
        it = inp_tgt_selector("MagPhonemes", N_d=512, N_s=256, K=512,
                              f_s=16000, Noutp=n_pho)
        net = network_selector("ResNetV2", n_pho, d_model=32, n_blocks=2,
                               d_f=16, k=3, max_d_rate=2, causal=True,
                               unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
        tx = make_optimizer("ResNetV2")
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 257)))
        state = TrainState.create(params, tx)
        step = jax.jit(make_phoneme_train_step(net, it, tx))
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(10):
            key, k = jax.random.split(key)
            state, m = step(state, k, jnp.asarray(s), jnp.asarray(d),
                            jnp.asarray(s_len), jnp.asarray(d_len),
                            jnp.asarray(snr), jnp.asarray(labels))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_framework_train_routes_labels(self, tmp_path):
        """DeepXiTPU.train drives the labelled loader + phoneme step when
        inp_tgt_type == MagPhonemes (the fork's central extension,
        ref: deepxi/model.py:113-222 with phoneme_mbatch_gen_aug), and the
        trained posteriors drive MixMax synthesis."""
        from deepxi_tpu.cli import config_from_args
        from deepxi_tpu.data import batch_list, batch_list_labelled, save_wav
        from deepxi_tpu.dsp.mixmax import gaussians_from_stats
        from deepxi_tpu.framework import DeepXiTPU

        fs = 16000
        rng = np.random.RandomState(3)
        lex = tmp_path / "lex.txt"
        lex.write_text("b  | b\nan | a n\n")
        set_path = tmp_path / "set"
        wav_dir = set_path / "train_clean_speech"
        noise_dir = set_path / "train_noise"
        ali_lines = []
        for i in range(4):
            n = 8192
            save_wav(str(wav_dir / f"u{i}.wav"),
                     (rng.randn(n) * 3000).astype(np.int16), fs)
            save_wav(str(noise_dir / f"n{i}.wav"),
                     (rng.randn(3 * n) * 1500).astype(np.int16), fs)
            dur = n / fs
            ali_lines.append(f"u{i}\n0.00 {dur/2:.2f} b\n{dur/2:.2f} {dur:.2f} a1\n.")
        (tmp_path / "out.ali").write_text("\n".join(ali_lines) + "\n")

        n_pho = 12
        cfg = config_from_args([
            "--ver", "pho-tiny", "--train", "1",
            "--inp_tgt_type", "MagPhonemes", "--Noutp", str(n_pho),
            "--network_type", "ResNetV2", "--d_model", "32", "--n_blocks", "2",
            "--d_f", "16", "--k", "3", "--max_d_rate", "2",
            "--unit_type", "ReLU->LN->W+b", "--mbatch_size", "2",
            "--max_epochs", "2", "--val_flag", "0", "--min_snr", "0",
            "--max_snr", "10", "--snr_inter", "5",
            "--ali_path", str(tmp_path / "out.ali"),
            "--lexicon_path", str(lex),
            "--set_path", str(set_path),
            "--data_path", str(tmp_path / "data"),
            "--model_path", str(tmp_path / "model"),
            "--log_path", str(tmp_path / "log"),
            "--out_path", str(tmp_path / "out")])
        assert cfg.ali_path and cfg.lexicon_path
        s_list = batch_list_labelled(str(wav_dir), cfg.ali_path,
                                     cfg.lexicon_path, "clean_speech",
                                     cfg.data_path, frame_ms=cfg.T_s)
        d_list = batch_list(str(noise_dir), "noise", cfg.data_path)
        dx = DeepXiTPU(cfg, s_list, d_list)
        losses = dx.train(verbose=False)
        assert len(losses) == 2 and np.isfinite(losses).all()
        assert losses[1] < losses[0]

        # posteriors from the trained classifier drive MixMax synthesis
        params = dx.load_epoch(2)
        model = gaussians_from_stats(rng.randn(n_pho, 257),
                                     np.full((n_pho, 257), 0.5),
                                     np.full(n_pho, 1 / n_pho))
        it = dx.inp_tgt.replace(mixmax_model=model)
        x = (rng.randn(8192) * 3000).astype(np.int16)
        mag, pha = it.observation(jnp.asarray(x))
        post = dx.network.apply(params, mag[None])[0]
        assert post.shape[-1] == n_pho
        y = it.enhanced_speech(mag, pha, post, "mixmax")
        assert np.isfinite(np.asarray(y)).all()

        # --out_type pho posterior dump (ref: deepxi/model.py:334-427):
        # full posterior .mat plus the reference's one-token-per-line CSV
        written = dx.infer(out_type="pho", epochs=[2],
                           test_x_path=str(wav_dir))
        assert len(written) == 4
        from scipy.io import loadmat
        mat = loadmat(written[0])["pho_post"]
        assert mat.shape[-1] == n_pho
        csv_path = written[0][:-len(".mat")] + ".csv"
        assert os.path.exists(csv_path)
        tokens = open(csv_path).read().split()
        assert len(tokens) == mat.shape[0]

    def test_framework_rejects_unlabelled_list(self, tmp_path):
        from deepxi_tpu.config import Config
        from deepxi_tpu.data import save_wav
        from deepxi_tpu.framework import DeepXiTPU
        fs = 16000
        rng = np.random.RandomState(4)
        wav_dir = tmp_path / "set" / "train_clean_speech"
        save_wav(str(wav_dir / "u0.wav"),
                 (rng.randn(8192) * 3000).astype(np.int16), fs)
        items = [{"file_path": str(wav_dir / "u0.wav"), "wav_len": 8192}]
        cfg = Config(ver="pho-bad", inp_tgt_type="MagPhonemes", Noutp=4,
                     network_type="ResNetV2", d_model=32, n_blocks=2, d_f=16,
                     k=3, max_d_rate=2, unit_type="ReLU->LN->W+b",
                     mbatch_size=1, max_epochs=1, val_flag=False,
                     data_path=str(tmp_path / "data"),
                     model_path=str(tmp_path / "model"),
                     log_path=str(tmp_path / "log"))
        dx = DeepXiTPU(cfg, items, items)
        with pytest.raises(ValueError, match="labelled"):
            dx.train(verbose=False)
