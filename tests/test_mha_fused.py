"""Fused Pallas attention (ops/kernels/mha_fused.py): the VMEM-resident
score path must match the full [B,H,T,T] reference path on every VALID
frame (invalid/padded query rows legitimately differ -- they see the
kernel's key padding -- and are discarded by every caller)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.models import network_selector
from deepxi_tpu.models.attention import sequence_valid_mask
from deepxi_tpu.ops.kernels.mha_fused import flash_attention


def make_input(B=2, T=70, F=257, valid=None, seed=0):
    """Network input with optional per-row valid lengths (rest zeroed)."""
    x = np.abs(np.random.RandomState(seed).randn(B, T, F)).astype(np.float32)
    if valid is not None:
        for b, n in enumerate(valid):
            x[b, n:] = 0.0
    return jnp.asarray(x)


@pytest.mark.parametrize("causal", [True, False])
def test_kernel_matches_reference_math(causal):
    """Raw kernel vs explicit additive-mask softmax on [B,T,H,d] heads."""
    B, T, H, d = 2, 70, 4, 8
    rs = np.random.RandomState(1)
    qp, kp, vp = (jnp.asarray(rs.randn(B, T, H, d).astype(np.float32))
                  for _ in range(3))
    valid = jnp.asarray(np.array([[True] * T, [True] * 50 + [False] * 20]))

    logits = jnp.einsum("btHd,bsHd->bHts", qp, kp)
    m = (valid[:, None, :] & valid[:, :, None])
    if causal:
        m = m & jnp.tril(jnp.ones((T, T), bool))[None]
    logits = logits + (-1.0e10) * (1.0 - m[:, None].astype(jnp.float32))
    ref = jnp.einsum("bHts,bsHd->btHd", jax.nn.softmax(logits, -1), vp)

    out = flash_attention(qp, kp, vp, valid, causal, block_q=32)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(ref)[v],
                               atol=2e-5)


@pytest.mark.parametrize("net_type", ["MHANetV2", "MHANetV3"])
def test_network_fused_matches_full(net_type):
    kw = dict(d_model=32, n_blocks=2, n_heads=4, causal=True,
              outp_act="Sigmoid")
    if net_type == "MHANetV3":
        kw["max_len"] = 128
    full = network_selector(net_type, 257, **kw)
    x = make_input(valid=(70, 49))
    params = full.init(jax.random.PRNGKey(0), x)
    y_full = np.asarray(full.apply(params, x))
    y_fused = np.asarray(full.clone(attention_impl="fused", block_q=32
                                    ).apply(params, x))
    valid = np.asarray(sequence_valid_mask(x))
    np.testing.assert_allclose(y_fused[valid], y_full[valid], atol=2e-5)


def test_enhancer_fused_matches_full():
    """Whole wav->wav pipeline: cloning the net to attention_impl='fused'
    (what framework._fast_enhancer does under cfg.mha_fused) reproduces the
    full-attention enhancement."""
    from deepxi_tpu.enhance import make_enhancer
    from deepxi_tpu.inp_tgt import inp_tgt_selector

    net = network_selector("MHANetV3", 257, d_model=32, n_blocks=2,
                           n_heads=4, causal=True, outp_act="Sigmoid",
                           max_len=128)
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
              ).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 257)))
    x = (np.random.RandomState(3).randn(2, 16000) * 3000).astype(np.int16)
    y_full = np.asarray(make_enhancer(it, net, "mmse-lsa")(params,
                                                           jnp.asarray(x)))
    y_fused = np.asarray(make_enhancer(
        it, net.clone(attention_impl="fused", block_q=32), "mmse-lsa")(
        params, jnp.asarray(x)))
    np.testing.assert_allclose(y_fused, y_full, atol=2e-4)


def test_block_q_larger_than_t():
    net = network_selector("MHANetV2", 257, d_model=32, n_blocks=1, n_heads=4,
                           causal=True, outp_act="Sigmoid")
    x = make_input(T=10, valid=(10, 7))
    params = net.init(jax.random.PRNGKey(0), x)
    y_full = np.asarray(net.apply(params, x))
    y_fused = np.asarray(net.clone(attention_impl="fused", block_q=256
                                   ).apply(params, x))
    valid = np.asarray(sequence_valid_mask(x))
    np.testing.assert_allclose(y_fused[valid], y_full[valid], atol=2e-5)
