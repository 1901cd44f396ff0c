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


@pytest.mark.slow  # >25 s on a contended CPU (r4 VERDICT #8 durations pass)
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


@pytest.mark.slow  # >25 s on a contended CPU (r4 VERDICT #8 durations pass)
def test_query_tiled_long_sequence(setup):
    """Sequences past the logits cap run the row-tiled attention + FFN
    path inside the same kernel; equivalence holds across the tile seams
    (uneven final tile included)."""
    net, params, _, _ = setup
    rng = np.random.RandomState(5)
    x = np.abs(rng.randn(1, 300, 17)).astype("float32")
    x[0, 280:] = 0.0
    x = jnp.asarray(x)
    y_ref = np.asarray(net.apply(params, x))
    from deepxi_tpu.ops.kernels import mha_block_fused as m
    y = np.asarray(m.mhanetv3_apply_fused(params, x, n_blocks=2, n_heads=4,
                                          d_model=32, max_len=128,
                                          whole_max_t=512))
    # force multi-tile: tile_q derived cap (1<<20)//Tp is huge at toy Tp,
    # so call the block directly with a small tile too
    np.testing.assert_allclose(y[0, :280], y_ref[0, :280], atol=1e-4)

    from deepxi_tpu.models.attention import sequence_valid_mask
    p = params["params"]
    valid = sequence_valid_mask(x).astype(jnp.float32)
    h = m._dot(x, p["in_conv"]["kernel"][0])
    h = m._ln(h, p["in_ln"]["scale"], p["in_ln"]["bias"])
    h = jax.nn.relu(h)
    pos = jnp.arange(300) % 128
    h = h + p["pos_emb"]["embedding"][pos][None]
    Tp = 384
    hp = jnp.pad(h, ((0, 0), (0, Tp - 300), (0, 0)))
    vp = jnp.pad(valid, ((0, 0), (0, Tp - 300)))[:, None, :]
    bw = m.BlockWeights(
        qk=p["block0_mha"]["query_kernel"], kk=p["block0_mha"]["key_kernel"],
        vk=p["block0_mha"]["value_kernel"],
        ok=p["block0_mha"]["projection_kernel"],
        ln1_s=p["block0_ln1"]["scale"], ln1_b=p["block0_ln1"]["bias"],
        ff1_w=p["block0_ff1"]["kernel"], ff1_b=p["block0_ff1"]["bias"],
        ff2_w=p["block0_ff2"]["kernel"], ff2_b=p["block0_ff2"]["bias"],
        ln2_s=p["block0_ln2"]["scale"], ln2_b=p["block0_ln2"]["bias"])
    y_full = m.fused_transformer_block(hp, vp, bw, causal=True)
    y_tiled = m.fused_transformer_block(hp, vp, bw, causal=True, tile_q=128)
    np.testing.assert_allclose(np.asarray(y_tiled)[0, :280],
                               np.asarray(y_full)[0, :280], atol=1e-4)
