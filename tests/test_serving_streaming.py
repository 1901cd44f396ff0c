"""Streaming serving exports (serving.export_streaming): the serialized
(state, chunk) -> (state, out) step must reproduce the live streaming
engines across a bytes-on-disk round trip, for both the per-hop TCN step
and the chunked MHANet step_block."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.inp_tgt import inp_tgt_selector
from deepxi_tpu.models import network_selector
from deepxi_tpu.serving import export_streaming, load_streaming_server
from deepxi_tpu.streaming import StreamingEnhancer, StreamingMHANet


@pytest.fixture(scope="module")
def it():
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
              ).astype(np.float32)
    return it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))


def _drive(sm_step, state, chunks):
    outs = []
    for c in chunks:
        state, y = sm_step(state, c)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=1)


def test_streaming_mha_chunked_export(it, tmp_path):
    net = network_selector("MHANetV3", 257, d_model=32, n_blocks=2,
                           n_heads=4, causal=True, outp_act="Sigmoid",
                           max_len=64)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
    sm = StreamingMHANet(it, net, params, "mmse-lsa")
    B, H = 2, 2
    export_streaming(sm, str(tmp_path), batch=B, hop_batch=H, ver="t")

    srv = load_streaming_server(str(tmp_path))
    assert srv.hop_batch == H and srv.batch == B

    rng = np.random.RandomState(1)
    chunks = [(rng.randn(B, H * 256) * 3000).astype(np.int16)
              for _ in range(3)]
    y_live = _drive(jax.jit(sm.step_block), sm.init_state(B), chunks)
    y_srv = _drive(srv.step, srv.init_state(), chunks)
    np.testing.assert_allclose(y_srv, y_live, atol=1e-5)


def test_streaming_tcn_export(it, tmp_path):
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=3, d_f=16,
                           k=3, max_d_rate=2, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
    sm = StreamingEnhancer(it, net, params)
    B = 2
    export_streaming(sm, str(tmp_path), batch=B, hop_batch=1, ver="t")

    srv = load_streaming_server(str(tmp_path))
    rng = np.random.RandomState(2)
    chunks = [(rng.randn(B, 256) * 3000).astype(np.int16) for _ in range(4)]
    y_live = _drive(jax.jit(sm.step), sm.init_state(B), chunks)
    y_srv = _drive(srv.step, srv.init_state(), chunks)
    np.testing.assert_allclose(y_srv, y_live, atol=1e-5)


def test_hop_batch_needs_step_block(it, tmp_path):
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=3, d_f=16,
                           k=3, max_d_rate=2, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
    sm = StreamingEnhancer(it, net, params)
    with pytest.raises(ValueError, match="step_block"):
        export_streaming(sm, str(tmp_path), batch=1, hop_batch=4)
