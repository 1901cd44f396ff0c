"""Blockwise (long-context) attention: must match the full-matrix path with
identical parameters, for causal and non-causal, with padding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.models import network_selector


def make_input(B=2, T=70, F=257, valid=(70, 45)):
    rng = np.random.RandomState(0)
    x = np.zeros((B, T, F), np.float32)
    for i, v in enumerate(valid):
        x[i, :v] = np.abs(rng.randn(v, F)) + 1e-3
    return jnp.asarray(x)


@pytest.mark.parametrize("nt,causal", [
    pytest.param("MHANetV2", True, marks=pytest.mark.slow),  # 35 s contended
    ("MHANetV2", False), ("MHANetV3", True), ("MHANetV3", False)])
def test_block_matches_full(nt, causal):
    kw = dict(d_model=32, n_blocks=2, n_heads=4, causal=causal,
              outp_act="Sigmoid")
    if nt == "MHANetV3":
        kw["max_len"] = 128
    full = network_selector(nt, 257, **kw)
    x = make_input()
    params = full.init(jax.random.PRNGKey(0), x)
    y_full = np.asarray(full.apply(params, x))

    block = full.clone(attention_impl="block", block_q=16)
    y_block = np.asarray(block.apply(params, x))
    # identical params, same additive-mask softmax -> float-rounding equal
    np.testing.assert_allclose(y_block, y_full, atol=2e-5)


def test_block_q_larger_than_t():
    net = network_selector("MHANetV2", 257, d_model=32, n_blocks=1, n_heads=4,
                           causal=True, outp_act="Sigmoid")
    x = make_input(T=10, valid=(10, 7))
    params = net.init(jax.random.PRNGKey(0), x)
    y_full = np.asarray(net.apply(params, x))
    y_block = np.asarray(net.clone(attention_impl="block", block_q=256
                                     ).apply(params, x))
    np.testing.assert_allclose(y_block, y_full, atol=2e-5)
