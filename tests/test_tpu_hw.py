"""Hardware-gated tests (run with DEEPXI_TPU_TESTS=1 on the real chip;
serialise with any other TPU process).

Round-1 advisor finding: the fused Pallas TCN ships enabled for the
flagship preset with bf16 in-kernel matmuls, but CPU tests exercise it only
in interpret mode (f32) -- the shipped numerics were never tested. This
suite trains the full-size flagship net briefly on-device (bf16 deviation
is only meaningful on trained weights; random weights diverge wildly, a
measured round-1 fact) and asserts the fused path is quality-neutral in
PESQ/STOI terms against the f32 XLA path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def trained_flagship():
    """resnet-1.1c-sized net trained a few hundred steps on synthetic
    speech -- enough for LN statistics and conv weights to leave the random
    regime that amplifies bf16 op-order noise."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import synth_corpus

    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.models import network_selector
    from deepxi_tpu.training import TrainState, make_optimizer, make_train_step

    rng = np.random.RandomState(0)
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    # stats from a quick synthetic sample
    s_w = np.stack([synth_corpus.synth_utterance(rng, 2.0) for _ in range(12)])
    d_w = np.stack([synth_corpus.synth_noise(rng, "pink", 2.0) for _ in range(12)])
    wl = np.full(12, s_w.shape[1], np.int32)
    it = it.with_stats(s_w.astype(np.float32) / 32768.0,
                       d_w.astype(np.float32) / 32768.0,
                       (s_w.astype(np.float32) + d_w.astype(np.float32)) / 32768.0,
                       wl)
    net = network_selector("ResNetV2", 257, d_model=256, n_blocks=40, d_f=64,
                           k=3, max_d_rate=16, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    tx = make_optimizer("ResNetV2")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((4, 32, 257)))
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(net, it, tx), donate_argnums=(0,))
    B, L = 4, 32000
    key = jax.random.PRNGKey(1)
    s = np.stack([synth_corpus.synth_utterance(rng, 2.0) for _ in range(B)])
    d = np.stack([synth_corpus.synth_noise(rng, "pink", 4.0) for _ in range(B)])
    losses = []
    for i in range(200):
        key, k = jax.random.split(key)
        state, m = step(state, k, jnp.asarray(s), jnp.asarray(d),
                        jnp.asarray([s.shape[1]] * B, jnp.int32),
                        jnp.asarray([d.shape[1]] * B, jnp.int32),
                        jnp.asarray(rng.choice([0., 5., 10.], B).astype(np.float32)))
        if i % 50 == 0:
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    return it, net, state.params, rng


class TestFusedTCNOnHardware:
    def test_bf16_fused_quality_neutral(self, trained_flagship):
        """The shipped default (tcn_fused=True for resnet-1.1c) must be
        quality-neutral: PESQ delta < 0.05 MOS, STOI delta < 0.3 pp vs the
        f32 XLA conv path on the same trained weights."""
        import synth_corpus

        from deepxi_tpu.enhance import make_enhancer
        from deepxi_tpu.metrics import stoi
        from deepxi_tpu.metrics.pesq import pesq
        from deepxi_tpu.ops.kernels.tcn_fused import resnetv2_apply_fused

        it, net, params, rng = trained_flagship
        enhance_xla = make_enhancer(it, net, "mmse-lsa")
        fused = lambda p, m: resnetv2_apply_fused(p, m, n_blocks=40, max_d_rate=16)
        enhance_fused = make_enhancer(it, net, "mmse-lsa", apply_fn=fused)

        deltas_p, deltas_s = [], []
        for seed in range(3):
            r2 = np.random.RandomState(100 + seed)
            s = synth_corpus.synth_utterance(r2, 4.0)
            d = synth_corpus.synth_noise(r2, ("white", "pink", "babble")[seed], 5.0)
            x = (s.astype(np.float32) + d[: len(s)].astype(np.float32) * 0.5
                 ).clip(-32768, 32767).astype(np.int16)
            L = 65536
            w = np.zeros((1, L), np.int16)
            w[0, : len(x)] = x
            y_x = np.asarray(enhance_xla(params, jnp.asarray(w)))[0][: len(s)]
            y_f = np.asarray(enhance_fused(params, jnp.asarray(w)))[0][: len(s)]
            ref = s.astype(np.float64) / 32768.0
            deltas_p.append(abs(pesq(ref, y_x, 16000) - pesq(ref, y_f, 16000)))
            deltas_s.append(abs(100 * stoi(ref, y_x, 16000)
                                - 100 * stoi(ref, y_f, 16000)))
        assert max(deltas_p) < 0.05, deltas_p
        assert max(deltas_s) < 0.3, deltas_s

    def test_dft_precision_default_quality_neutral(self, trained_flagship):
        """dft_precision='default' (one-pass bf16 DFT matmuls, the flagship
        preset's shipped setting, ~1.2x end-to-end) must be quality-neutral
        vs 'highest' on trained weights. Measured when introduced:
        |PESQ delta| <= 0.0012 MOS, |STOI delta| <= 0.19 pp, rel waveform
        deviation <= 9e-3 over white/pink/babble conditions."""
        import synth_corpus

        from deepxi_tpu.enhance import make_enhancer
        from deepxi_tpu.metrics import stoi
        from deepxi_tpu.metrics.pesq import pesq
        from deepxi_tpu.ops.kernels.tcn_fused import resnetv2_apply_fused

        it, net, params, rng = trained_flagship
        fused = lambda p, m: resnetv2_apply_fused(p, m, n_blocks=40, max_d_rate=16)
        enh_hi = make_enhancer(it, net, "mmse-lsa", apply_fn=fused,
                               precision="highest")
        enh_df = make_enhancer(it, net, "mmse-lsa", apply_fn=fused,
                               precision="default")
        deltas_p, deltas_s = [], []
        for seed in range(3):
            r2 = np.random.RandomState(300 + seed)
            s = synth_corpus.synth_utterance(r2, 4.0)
            d = synth_corpus.synth_noise(r2, ("white", "pink", "babble")[seed], 5.0)
            x = (s.astype(np.float32) + d[: len(s)].astype(np.float32) * 0.5
                 ).clip(-32768, 32767).astype(np.int16)
            w = np.zeros((1, 65536), np.int16)
            w[0, : len(x)] = x
            y_h = np.asarray(enh_hi(params, jnp.asarray(w)))[0][: len(s)]
            y_d = np.asarray(enh_df(params, jnp.asarray(w)))[0][: len(s)]
            ref = s.astype(np.float64) / 32768.0
            deltas_p.append(abs(pesq(ref, y_h, 16000) - pesq(ref, y_d, 16000)))
            deltas_s.append(abs(100 * stoi(ref, y_h, 16000)
                                - 100 * stoi(ref, y_d, 16000)))
        assert max(deltas_p) < 0.05, deltas_p
        assert max(deltas_s) < 0.5, deltas_s

    def test_fused_attention_matches_full_on_chip(self):
        """attention_impl='fused' (the MHANet inference default) vs 'full'
        on the real chip: same enhancement waveform to bf16 op-order noise.
        CPU interpret mode pins float-exactness (tests/test_mha_fused.py);
        this pins the shipped Mosaic lowering."""
        from deepxi_tpu.enhance import make_enhancer
        from deepxi_tpu.inp_tgt import inp_tgt_selector
        from deepxi_tpu.models import network_selector

        net = network_selector("MHANetV3", 257, d_model=256, n_blocks=5,
                               n_heads=8, causal=True, outp_act="Sigmoid",
                               max_len=2048)
        it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                              map_type="DBNormalCDF", map_params=None)
        sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
                  ).astype(np.float32)
        it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 257)))
        x = (np.random.RandomState(7).randn(2, 32000) * 3000).astype(np.int16)
        y_full = np.asarray(make_enhancer(it, net, "mmse-lsa")(
            params, jnp.asarray(x)))
        y_fused = np.asarray(make_enhancer(
            it, net.clone(attention_impl="fused"), "mmse-lsa")(
            params, jnp.asarray(x)))
        rms = float(np.sqrt(np.mean(y_full ** 2)))
        dev = float(np.sqrt(np.mean((y_full - y_fused) ** 2)))
        assert dev < 0.02 * max(rms, 1e-6), (dev, rms)

    def test_fused_train_grads_match_on_chip(self, trained_flagship):
        """Custom-VJP fused TCN gradients vs jax.grad of the flax model at
        full flagship size on the real chip. Both paths run bf16-multiply
        matmuls in DIFFERENT op orders, and that noise compounds over 40
        blocks of backprop, so per-element closeness is the wrong bar
        (measured on random weights: per-tensor relative-L2 up to ~0.29,
        median ~0.19, worst in the earliest blocks -- yet cosine similarity
        stays >= 0.96, and a full campaign trained through the kernel
        matches the XLA path's quality, README's fused-train row). f32
        exactness is pinned on CPU (tests/test_tcn_fused_train.py, 2e-4);
        here we pin gradient DIRECTION per tensor."""
        from deepxi_tpu.ops.kernels.tcn_fused_train import \
            resnetv2_apply_fused_train

        it, net, params, rng = trained_flagship
        x = jnp.asarray(rng.randn(2, 64, 257).astype(np.float32))
        tgt = jnp.asarray(rng.rand(2, 64, 257).astype(np.float32))

        def loss(apply_fn):
            return jax.jit(jax.grad(
                lambda p: jnp.mean(jnp.square(apply_fn(p, x) - tgt))))

        g_ref = loss(net.apply)(params)
        g_fus = loss(lambda p, m: resnetv2_apply_fused_train(
            p, m, n_blocks=40, max_d_rate=16))(params)
        for r, f in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_fus)):
            r = np.asarray(r, np.float64).ravel()
            f = np.asarray(f, np.float64).ravel()
            nr, nf = np.linalg.norm(r), np.linalg.norm(f)
            if nr < 1e-12:
                continue
            cos = float(r @ f / max(nr * nf, 1e-12))
            rel = float(np.linalg.norm(r - f) / nr)
            assert cos > 0.95 and rel < 0.35, (cos, rel)

    def test_fused_waveform_deviation_bounded(self, trained_flagship):
        """Raw waveform deviation of the bf16 fused path stays small on
        trained weights (round-1 measured ~2e-2 sigmoid-output deviation)."""
        import synth_corpus

        from deepxi_tpu.enhance import make_enhancer
        from deepxi_tpu.ops.kernels.tcn_fused import resnetv2_apply_fused

        it, net, params, rng = trained_flagship
        r2 = np.random.RandomState(200)
        x = synth_corpus.synth_utterance(r2, 4.0)
        w = np.zeros((1, 65536), np.int16)
        w[0, : len(x)] = x
        y_x = np.asarray(make_enhancer(it, net, "mmse-lsa")(params, jnp.asarray(w)))
        fused = lambda p, m: resnetv2_apply_fused(p, m, n_blocks=40, max_d_rate=16)
        y_f = np.asarray(make_enhancer(it, net, "mmse-lsa", apply_fn=fused)(
            params, jnp.asarray(w)))
        rms = float(np.sqrt(np.mean(y_x ** 2)))
        dev = float(np.sqrt(np.mean((y_x - y_f) ** 2)))
        assert dev < 0.1 * max(rms, 1e-6), (dev, rms)


class TestStreamingMHACacheOnHardware:
    def test_fused_cache_step_matches_unfused_on_chip(self):
        """The Pallas KV-cache attention step (ops/kernels/mha_cache.py)
        lowers on Mosaic and tracks the einsum step on the real chip
        (measured 2026-08-17: rel-RMS 2.1e-3 for BOTH f32 and bf16
        caches -- the deviation is the kernel's own bf16-multiply dots,
        not the cache dtype)."""
        from deepxi_tpu.inp_tgt import inp_tgt_selector
        from deepxi_tpu.models import network_selector
        from deepxi_tpu.streaming import StreamingMHANet

        it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                              map_type="DBNormalCDF", map_params=None)
        sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
                  ).astype(np.float32)
        it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
        net = network_selector("MHANetV3", 257, d_model=256, n_blocks=5,
                               n_heads=8, causal=True, outp_act="Sigmoid",
                               max_len=2048)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 257)))
        rng = np.random.RandomState(3)
        x = (rng.randn(1, 256 * 12) * 3000).astype(np.int16)
        y_ref = np.asarray(StreamingMHANet(it, net, params, "mmse-lsa")
                           .stream(jnp.asarray(x)))
        for dt in (jnp.float32, jnp.bfloat16):
            smf = StreamingMHANet(it, net, params, "mmse-lsa", fused=True,
                                  cache_dtype=dt)
            y_f = np.asarray(smf.stream(jnp.asarray(x)))
            rel = (np.sqrt(np.mean((y_f - y_ref) ** 2))
                   / (np.sqrt(np.mean(y_ref ** 2)) + 1e-12))
            assert rel < 1e-2, (dt, rel)
