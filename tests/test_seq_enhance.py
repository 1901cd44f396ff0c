"""Sequence-parallel long-audio enhancement (parallel/seq_enhance.py):
the time-sharded pipeline over the virtual 8-device mesh must reproduce the
single-device fused pipeline exactly (same frames, same context), and the
halo machinery must respect the TCN's receptive field."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.enhance import make_enhancer
from deepxi_tpu.inp_tgt import inp_tgt_selector
from deepxi_tpu.models import network_selector
from deepxi_tpu.parallel import make_mesh
from deepxi_tpu.parallel.seq_enhance import (make_seq_sharded_enhancer,
                                             receptive_field_frames)


@pytest.fixture(scope="module")
def setup():
    n_blocks, max_d_rate, k = 6, 4, 3
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=n_blocks,
                           d_f=16, k=k, max_d_rate=max_d_rate, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
              ).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 257)))
    return it, net, params, (n_blocks, max_d_rate, k)


def test_receptive_field_formula():
    # flagship: 40 blocks, dilations cycle 1..16 -> 8 cycles of 31 reach * 2
    assert receptive_field_frames(40, 16, 3) == 1 + 2 * (1 + 2 + 4 + 8 + 16) * 8


class TestSeqSharded:
    def test_matches_offline_exactly(self, setup):
        it, net, params, (nb, mdr, k) = setup
        mesh = make_mesh(n_data=8, n_model=1)
        enh = make_seq_sharded_enhancer(it, net, "mmse-lsa", mesh=mesh,
                                        n_blocks=nb, max_d_rate=mdr, k=k)
        offline = make_enhancer(it, net, "mmse-lsa")
        # long enough that every shard exceeds the halo; not a multiple of
        # the chunk so the pad/trim path is exercised
        n = 8 * 256 * 40 + 1000
        x = (np.random.RandomState(1).randn(n) * 3000).astype(np.int16)
        y_sh = np.asarray(enh(params, jnp.asarray(x)))
        y_off = np.asarray(offline(params, jnp.asarray(x)[None]))[0, :n]
        assert y_sh.shape == (n,)
        np.testing.assert_allclose(y_sh, y_off, atol=2e-5)

    def test_non_tcn_rejected(self, setup):
        it, net, params, _ = setup
        mha = network_selector("MHANetV2", 257, d_model=32, n_blocks=1,
                               n_heads=4, causal=True, outp_act="Sigmoid")
        with pytest.raises(ValueError, match="ResNet family"):
            make_seq_sharded_enhancer(it, mha, "mmse-lsa",
                                      mesh=make_mesh(n_data=8, n_model=1))

    def test_too_short_input_raises(self, setup):
        it, net, params, (nb, mdr, k) = setup
        mesh = make_mesh(n_data=8, n_model=1)
        enh = make_seq_sharded_enhancer(it, net, "mmse-lsa", mesh=mesh,
                                        n_blocks=nb, max_d_rate=mdr, k=k)
        with pytest.raises(ValueError, match="halo"):
            enh(params, jnp.zeros(8 * 256 * 2, jnp.int16))

    def test_output_is_time_sharded(self, setup):
        """The result before host transfer is sharded over the data axis --
        long audio never gathers onto one device mid-pipeline."""
        it, net, params, (nb, mdr, k) = setup
        mesh = make_mesh(n_data=8, n_model=1)
        enh = make_seq_sharded_enhancer(it, net, "mmse-lsa", mesh=mesh,
                                        n_blocks=nb, max_d_rate=mdr, k=k)
        n = 8 * 256 * 40
        x = (np.random.RandomState(2).randn(n) * 3000).astype(np.int16)
        y = enh(params, jnp.asarray(x))
        assert np.isfinite(np.asarray(y)).all()
