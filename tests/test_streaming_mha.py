"""Streaming MHANet (KV-cache causal attention, streaming.StreamingMHANet):
the per-frame step must reproduce the offline fused pipeline exactly while
t < max_len, for both MHANetV2 (no positional embedding) and MHANetV3."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.enhance import make_enhancer
from deepxi_tpu.inp_tgt import inp_tgt_selector
from deepxi_tpu.models import network_selector
from deepxi_tpu.streaming import StreamingMHANet


@pytest.fixture(scope="module")
def it():
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
              ).astype(np.float32)
    return it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))


def make_net(net_type):
    kw = dict(d_model=32, n_blocks=2, n_heads=4, causal=True,
              outp_act="Sigmoid")
    if net_type == "MHANetV3":
        kw["max_len"] = 64
    net = network_selector(net_type, 257, **kw)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
    return net, params


@pytest.mark.parametrize("net_type", ["MHANetV2", "MHANetV3"])
def test_matches_offline(it, net_type):
    net, params = make_net(net_type)
    rng = np.random.RandomState(1)
    B, n = 2, 256 * 30   # 30 frames < max_len 64
    x = (rng.randn(B, n) * 3000).astype(np.int16)

    y_off = np.asarray(make_enhancer(it, net, "mmse-lsa")(params,
                                                          jnp.asarray(x)))
    sm = StreamingMHANet(it, net, params, "mmse-lsa")
    y_str = np.asarray(sm.stream(jnp.asarray(x)))
    T = n // 256
    np.testing.assert_allclose(y_str, y_off[:, : T * 256], atol=1e-5)


def test_step_by_step_equals_scan(it):
    net, params = make_net("MHANetV3")
    rng = np.random.RandomState(2)
    B, n = 1, 256 * 10
    x = (rng.randn(B, n) * 3000).astype(np.int16)
    sm = StreamingMHANet(it, net, params, "mmse-lsa")
    y1 = np.asarray(sm.stream(jnp.asarray(x)))

    chunks = jnp.asarray(x).reshape(B, -1, 256)
    state = sm.prime(sm.init_state(B), chunks[:, 0])
    step = jax.jit(sm.step)
    outs = []
    for i in range(1, chunks.shape[1]):
        state, y = step(state, chunks[:, i])
        outs.append(np.asarray(y))
    state, y = step(state, jnp.zeros((B, 256), jnp.int16))
    outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), y1, atol=1e-5)


@pytest.mark.parametrize("hop_batch", [2, 4, 5])
def test_step_block_equals_sequential_steps(it, hop_batch):
    """Chunked streaming (`step_block`, H hops per dispatch) must equal H
    sequential `step` calls to float rounding — the network is feed-forward
    over frames, so hop-batching only regroups the same math."""
    net, params = make_net("MHANetV3")
    rng = np.random.RandomState(4)
    B = 2
    n_hops = 2 * hop_batch + hop_batch  # a few blocks worth
    x = (rng.randn(B, 256 * (n_hops + 1)) * 3000).astype(np.int16)
    chunks = jnp.asarray(x).reshape(B, -1, 256)
    sm = StreamingMHANet(it, net, params, "mmse-lsa")

    state = sm.prime(sm.init_state(B), chunks[:, 0])
    step = jax.jit(sm.step)
    outs = []
    for i in range(1, chunks.shape[1]):
        state, y = step(state, chunks[:, i])
        outs.append(np.asarray(y))
    y_seq = np.concatenate(outs, axis=1)

    state_b = sm.prime(sm.init_state(B), chunks[:, 0])
    step_b = jax.jit(sm.step_block)
    outs_b = []
    for i in range(1, chunks.shape[1], hop_batch):
        block = chunks[:, i: i + hop_batch].reshape(B, -1)
        state_b, y = step_b(state_b, block)
        outs_b.append(np.asarray(y))
    y_blk = np.concatenate(outs_b, axis=1)
    np.testing.assert_allclose(y_blk, y_seq, atol=2e-5)


@pytest.mark.slow  # 32 s contended; sequential-parity cases keep fast coverage
def test_step_block_matches_offline(it):
    """Chunked streaming equals the offline fused pipeline end-to-end."""
    net, params = make_net("MHANetV2")
    rng = np.random.RandomState(5)
    B, H = 2, 4
    n_hops = 12
    x = (rng.randn(B, 256 * n_hops) * 3000).astype(np.int16)
    y_off = np.asarray(make_enhancer(it, net, "mmse-lsa")(params,
                                                          jnp.asarray(x)))
    sm = StreamingMHANet(it, net, params, "mmse-lsa")
    chunks = jnp.asarray(x).reshape(B, -1, 256)
    state = sm.prime(sm.init_state(B), chunks[:, 0])
    rest = jnp.concatenate([chunks[:, 1:],
                            jnp.zeros((B, 1, 256), chunks.dtype)], axis=1)
    outs = []
    for i in range(0, n_hops, H):
        state, y = sm.step_block(state, rest[:, i: i + H].reshape(B, -1))
        outs.append(np.asarray(y))
    y_blk = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(y_blk, y_off[:, : n_hops * 256], atol=1e-5)


def test_rejects_non_mha(it):
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=2, d_f=16,
                           k=3, max_d_rate=2, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
    with pytest.raises(ValueError, match="MHANetV2/V3"):
        StreamingMHANet(it, net, params)


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.bfloat16])
def test_fused_cache_step_matches_unfused(it, cache_dtype):
    """The Pallas KV-cache attention step (ops/kernels/mha_cache.py)
    reproduces the einsum step; bfloat16-resident caches stay within
    bf16 rounding of the float32 path (round-2 VERDICT next #6)."""
    net, params = make_net("MHANetV3")
    rng = np.random.RandomState(3)
    B, n = 2, 256 * 20
    x = (rng.randn(B, n) * 3000).astype(np.int16)
    y_ref = np.asarray(StreamingMHANet(it, net, params, "mmse-lsa")
                       .stream(jnp.asarray(x)))
    smf = StreamingMHANet(it, net, params, "mmse-lsa", fused=True,
                          cache_dtype=cache_dtype)
    y_fused = np.asarray(smf.stream(jnp.asarray(x)))
    atol = 1e-5 if cache_dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(y_fused, y_ref, atol=atol)
    if cache_dtype == jnp.bfloat16:
        # bf16 caches must still track the f32 waveform closely
        denom = np.sqrt(np.mean(y_ref ** 2)) + 1e-12
        rel = np.sqrt(np.mean((y_fused - y_ref) ** 2)) / denom
        assert rel < 0.05, rel
