"""Ring-sharded MHANet enhancement (parallel/ring_attention.py): time
sharded over the virtual 8-device mesh, the ring online-softmax must
reproduce the single-device fused pipeline on the whole recording to
float rounding -- the attention half of SURVEY.md section 2f item d
(seq_enhance covers the TCN half)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.enhance import make_enhancer
from deepxi_tpu.inp_tgt import inp_tgt_selector
from deepxi_tpu.models import network_selector
from deepxi_tpu.models.attention import sequence_valid_mask
from deepxi_tpu.parallel import make_mesh
from deepxi_tpu.parallel.ring_attention import (make_ring_mha_enhancer,
                                                mhanet_ring_apply,
                                                ring_attention)

KW = dict(d_model=32, n_blocks=2, n_heads=4, causal=True,
          outp_act="Sigmoid", max_len=2048)


@pytest.fixture(scope="module")
def setup():
    net = network_selector("MHANetV3", 257, **KW)
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
              ).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 257)))
    return it, net, params


@pytest.mark.slow  # >25 s on a contended CPU (r4 VERDICT #8 durations pass)
@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(causal):
    """Raw ring op on an 8-shard mesh == full-softmax reference on the
    gathered sequence (valid rows; global-position causal mask)."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=8, n_model=1)
    B, T, H, d = 2, 8 * 24, 4, 8
    rs = np.random.RandomState(3)
    qp, kp, vp = (jnp.asarray(rs.randn(B, T, H, d).astype(np.float32))
                  for _ in range(3))
    valid = jnp.asarray(np.arange(T)[None, :] < np.array([[T], [150]]))

    logits = jnp.einsum("btHd,bsHd->bHts", qp, kp)
    m = (valid[:, None, :] & valid[:, :, None])
    if causal:
        m = m & jnp.tril(jnp.ones((T, T), bool))[None]
    logits = logits + (-1.0e10) * (1.0 - m[:, None].astype(jnp.float32))
    ref = jnp.einsum("bHts,bsHd->btHd", jax.nn.softmax(logits, -1), vp)

    Ts = T // 8

    def body(q, k, v, vf):
        pos0 = jax.lax.axis_index("data") * Ts
        return ring_attention(q, k, v, vf, pos0, "data", 8, causal,
                              t_total=T, block_q=16)

    sh = NamedSharding(mesh, P(None, "data"))
    out = shard_map(body, mesh=mesh,
                    in_specs=(P(None, "data"), P(None, "data"),
                              P(None, "data"), P(None, "data")),
                    out_specs=P(None, "data"))(
        qp, kp, vp, valid.astype(jnp.float32))
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(ref)[v],
                               atol=3e-5)


@pytest.mark.slow  # >25 s on a contended CPU (r4 VERDICT #8 durations pass)
def test_ring_apply_matches_flax(setup):
    """mhanet_ring_apply over the mesh == MHANetV3.apply on the gathered
    magnitude batch (valid frames)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    it, net, params = setup
    mesh = make_mesh(n_data=8, n_model=1)
    T = 8 * 16
    mag = np.abs(np.random.RandomState(1).randn(1, T, 257)
                 ).astype(np.float32)
    mag[0, 100:] = 0.0
    mag = jnp.asarray(mag)
    y_ref = np.asarray(net.apply(params, mag))

    Ts = T // 8

    def body(p, m):
        pos0 = jax.lax.axis_index("data") * Ts
        return mhanet_ring_apply(p, m, pos0, "data", 8, n_blocks=2,
                                 n_heads=4, d_model=32, max_len=2048,
                                 causal=True, block_q=16)

    y = shard_map(body, mesh=mesh, in_specs=(P(), P(None, "data")),
                  out_specs=P(None, "data"))(params, mag)
    valid = np.asarray(sequence_valid_mask(mag))
    np.testing.assert_allclose(np.asarray(y)[valid], y_ref[valid],
                               atol=3e-5)


def test_ring_enhancer_matches_offline(setup):
    """End-to-end: the ring-sharded enhancer == the single-device fused
    enhancer on the whole recording (int16 in, waveform out)."""
    it, net, params = setup
    mesh = make_mesh(n_data=8, n_model=1)
    n = 8 * 256 * 40 + 1000   # ~5.2 s, ragged tail exercises the padding
    x = (np.random.RandomState(2).randn(n) * 3000).astype(np.int16)

    offline = make_enhancer(it, net, "mmse-lsa", precision="highest")
    y_ref = np.asarray(offline(params, jnp.asarray(x)[None]))[0, :n]

    enhance = make_ring_mha_enhancer(it, mesh=mesh, gtype="mmse-lsa",
                                     n_blocks=2, n_heads=4, d_model=32,
                                     max_len=2048, causal=True,
                                     precision="highest", block_q=64)
    y = np.asarray(enhance(params, jnp.asarray(x)))
    assert y.shape == (n,)
    scale = np.max(np.abs(y_ref)) + 1e-12
    np.testing.assert_allclose(y / scale, y_ref / scale, atol=2e-5)
