"""Streaming enhancement tests: per-frame TCN with delay-line state must
reproduce the offline pipeline exactly (one-hop IO latency)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.enhance import make_enhancer
from deepxi_tpu.inp_tgt import inp_tgt_selector
from deepxi_tpu.models import network_selector
from deepxi_tpu.streaming import StreamingEnhancer


@pytest.fixture(scope="module")
def setup():
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=5, d_f=16,
                           k=3, max_d_rate=4, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
    return it, net, params


class TestStreaming:
    def test_matches_offline(self, setup):
        it, net, params = setup
        rng = np.random.RandomState(1)
        B, n = 2, 256 * 40
        x = (rng.randn(B, n) * 3000).astype(np.int16)

        offline = make_enhancer(it, net, "mmse-lsa")
        y_off = np.asarray(offline(params, jnp.asarray(x)))

        se = StreamingEnhancer(it, net, params, "mmse-lsa")
        y_str = np.asarray(se.stream(jnp.asarray(x)))

        # stream() emits exactly the offline output (prime + pad_end chunk)
        T = n // 256
        np.testing.assert_allclose(y_str, y_off[:, : T * 256], atol=1e-5)

    def test_step_by_step_equals_scan(self, setup):
        it, net, params = setup
        se = StreamingEnhancer(it, net, params)
        rng = np.random.RandomState(2)
        x = (rng.randn(1, 256 * 8) * 3000).astype(np.int16)
        y1 = np.asarray(se.stream(jnp.asarray(x)))
        state = se.prime(se.init_state(1), jnp.asarray(x[:, :256]))
        step = jax.jit(se.step)
        outs = []
        for t in range(1, 8):
            state, o = step(state, jnp.asarray(x[:, t * 256:(t + 1) * 256]))
            outs.append(np.asarray(o))
        state, o = step(state, jnp.zeros((1, 256)))
        outs.append(np.asarray(o))
        y2 = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(y1, y2, atol=1e-6)

    def test_requires_causal(self, setup):
        it, net, params = setup
        from deepxi_tpu.models import network_selector
        noncausal = network_selector(
            "ResNetV2", 257, d_model=32, n_blocks=5, d_f=16, k=3, max_d_rate=4,
            causal=False, unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
        with pytest.raises(ValueError):
            StreamingEnhancer(it, noncausal, params)

    def test_state_shapes(self, setup):
        it, net, params = setup
        se = StreamingEnhancer(it, net, params)
        st = se.init_state(3)
        assert len(st.conv_bufs) == 5
        # cyclic dilations 1,2,4,1,2 with k=3 -> buffers (k-1)*d
        dil = [1, 2, 4, 1, 2]
        for buf, d in zip(st.conv_bufs, dil):
            assert buf.shape == (3, 2 * d, 16)
        assert st.wav_tail.shape == (3, 256)
        assert st.ola_tail.shape == (3, 256)
