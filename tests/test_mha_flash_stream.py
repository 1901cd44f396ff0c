"""Streaming online-softmax attention (ops/kernels/mha_flash_stream.py):
the length-uncapped key-tiled path must match the full [B,H,T,T] path on
every VALID frame, including when T spans several key tiles and the tiles
divide T unevenly (invalid/padded query rows legitimately differ and are
discarded by every caller -- same contract as mha_fused)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.models import network_selector
from deepxi_tpu.models.attention import sequence_valid_mask
from deepxi_tpu.ops.kernels.mha_flash_stream import flash_attention_streaming


def _reference(qp, kp, vp, valid, causal):
    T = qp.shape[1]
    logits = jnp.einsum("btHd,bsHd->bHts", qp, kp)
    m = (valid[:, None, :] & valid[:, :, None])
    if causal:
        m = m & jnp.tril(jnp.ones((T, T), bool))[None]
    logits = logits + (-1.0e10) * (1.0 - m[:, None].astype(jnp.float32))
    return jnp.einsum("bHts,bsHd->btHd", jax.nn.softmax(logits, -1), vp)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("T,block_q,block_k", [
    (70, 32, 16),     # several ragged tiles both ways
    (200, 32, 64),    # block_k > block_q (the production shape)
    (64, 64, 64),     # single tile each way
])
def test_kernel_matches_reference_math(causal, T, block_q, block_k):
    B, H, d = 2, 4, 8
    rs = np.random.RandomState(1)
    qp, kp, vp = (jnp.asarray(rs.randn(B, T, H, d).astype(np.float32))
                  for _ in range(3))
    valid = jnp.asarray(
        np.arange(T)[None, :] < np.array([[T], [int(T * 0.7)]]))

    ref = _reference(qp, kp, vp, valid, causal)
    out = flash_attention_streaming(qp, kp, vp, valid, causal,
                                    block_q=block_q, block_k=block_k)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(ref)[v],
                               atol=2e-5)


def test_network_stream_matches_full():
    """MHANetV3 end-to-end: attention_impl='stream' == 'full' on valid
    frames over a masked variable-length batch."""
    kw = dict(d_model=32, n_blocks=2, n_heads=4, causal=True,
              outp_act="Sigmoid", max_len=128)
    full = network_selector("MHANetV3", 257, **kw)
    x = np.abs(np.random.RandomState(0).randn(2, 70, 257)).astype(np.float32)
    x[1, 49:] = 0.0
    x = jnp.asarray(x)
    params = full.init(jax.random.PRNGKey(0), x)
    y_full = np.asarray(full.apply(params, x))
    y_stream = np.asarray(full.clone(attention_impl="stream", block_q=32
                                     ).apply(params, x))
    valid = np.asarray(sequence_valid_mask(x))
    np.testing.assert_allclose(y_stream[valid], y_full[valid], atol=2e-5)


def test_long_fallback_routes_to_stream():
    """mhanetv3_apply_fused beyond whole_max_t must produce the stream
    path's output (and agree with the flax full path on valid frames)."""
    from deepxi_tpu.ops.kernels.mha_block_fused import mhanetv3_apply_fused

    kw = dict(d_model=32, n_blocks=2, n_heads=4, causal=True,
              outp_act="Sigmoid", max_len=64)
    net = network_selector("MHANetV3", 257, **kw)
    x = np.abs(np.random.RandomState(2).randn(1, 150, 257)).astype(np.float32)
    x = jnp.asarray(x)
    params = net.init(jax.random.PRNGKey(0), x)
    y_full = np.asarray(net.apply(params, x))
    y_long = np.asarray(mhanetv3_apply_fused(
        params, x, n_blocks=2, n_heads=4, d_model=32, max_len=64,
        whole_max_t=128))
    np.testing.assert_allclose(y_long, y_full, atol=3e-5)
