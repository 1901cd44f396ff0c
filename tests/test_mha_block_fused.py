"""Fully-fused MHANet transformer block: equivalence with the flax
MHANetV3 full-attention path on valid rows (padded tails included)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.models import network_selector
from deepxi_tpu.ops.kernels.mha_block_fused import mhanetv3_apply_fused


@pytest.fixture(scope="module")
def setup():
    net = network_selector("MHANetV3", 17, d_model=32, n_blocks=2, n_heads=4,
                           causal=True, outp_act="Sigmoid", max_len=128)
    rng = np.random.RandomState(0)
    x = np.abs(rng.randn(3, 50, 17)).astype("float32")
    x[0, 40:] = 0.0
    x[2, 25:] = 0.0  # Keras Masking(0.0)-style padded tails
    x = jnp.asarray(x)
    params = net.init(jax.random.PRNGKey(0), x)
    return net, params, x, [(0, 40), (1, 50), (2, 25)]


def test_matches_flax_full(setup):
    net, params, x, valid = setup
    y_ref = np.asarray(net.apply(params, x))
    y = np.asarray(mhanetv3_apply_fused(params, x, n_blocks=2, n_heads=4,
                                        d_model=32, max_len=128))
    for b, t in valid:
        np.testing.assert_allclose(y[b, :t], y_ref[b, :t], atol=1e-4)


def test_non_causal(setup):
    net_nc = network_selector("MHANetV3", 17, d_model=32, n_blocks=2,
                              n_heads=4, causal=False, outp_act="Sigmoid",
                              max_len=128)
    _, _, x, valid = setup
    params = net_nc.init(jax.random.PRNGKey(1), x)
    y_ref = np.asarray(net_nc.apply(params, x))
    y = np.asarray(mhanetv3_apply_fused(params, x, n_blocks=2, n_heads=4,
                                        d_model=32, max_len=128,
                                        causal=False))
    for b, t in valid:
        np.testing.assert_allclose(y[b, :t], y_ref[b, :t], atol=1e-4)


def test_long_sequence_falls_back(setup):
    """Beyond whole_max_t the flax fused-attention path takes over; output
    still matches the full path."""
    net, params, _, _ = setup
    rng = np.random.RandomState(3)
    x = jnp.asarray(np.abs(rng.randn(1, 40, 17)).astype("float32"))
    y_ref = np.asarray(net.apply(params, x))
    y = np.asarray(mhanetv3_apply_fused(params, x, n_blocks=2, n_heads=4,
                                        d_model=32, max_len=128,
                                        whole_max_t=32))
    np.testing.assert_allclose(y[0], y_ref[0], atol=1e-4)


def test_matches_flax_v2_no_positional(setup):
    """positional=False reproduces MHANetV2 (mhanet-1.0c: no pos_emb)."""
    net_v2 = network_selector("MHANetV2", 17, d_model=32, n_blocks=2,
                              n_heads=4, causal=True, outp_act="Sigmoid")
    _, _, x, valid = setup
    params = net_v2.init(jax.random.PRNGKey(2), x)
    y_ref = np.asarray(net_v2.apply(params, x))
    y = np.asarray(mhanetv3_apply_fused(params, x, n_blocks=2, n_heads=4,
                                        d_model=32, positional=False))
    for b, t in valid:
        np.testing.assert_allclose(y[b, :t], y_ref[b, :t], atol=1e-4)
