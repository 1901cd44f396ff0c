"""Fused multi-block TCN kernel: equivalence with the flax ResNetV2 across
group sizes, tiles, and nonzero biases (the pre-sequence halo regression)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.models import network_selector
from deepxi_tpu.ops.kernels.tcn_fused import resnetv2_apply_fused


@pytest.fixture(scope="module")
def setup():
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=10, d_f=16,
                           k=3, max_d_rate=4, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    rng = np.random.RandomState(0)
    x = jnp.abs(jnp.asarray(rng.randn(2, 100, 257), jnp.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    # nonzero biases: flax inits biases to zero, which hid the pre-sequence
    # halo bug (trained nets have nonzero biases)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, params)
    y_ref = np.asarray(net.apply(params, x))
    return net, params, x, y_ref


# whole_max_t=0 forces the halo-tiled kernel; the default routes short
# sequences through the whole-sequence kernel -- both must match flax.
@pytest.mark.parametrize("group,tile", [
    (5, 64),  # fast representative of the halo-tiled kernel
    pytest.param(5, 128, marks=pytest.mark.slow),
    pytest.param(10, 64, marks=pytest.mark.slow),
    pytest.param(2, 32, marks=pytest.mark.slow),
])
def test_matches_flax_halo(setup, group, tile):
    net, params, x, y_ref = setup
    y = np.asarray(resnetv2_apply_fused(params, x, n_blocks=10, max_d_rate=4,
                                        group=group, tile_t=tile,
                                        whole_max_t=0))
    np.testing.assert_allclose(y, y_ref, atol=5e-4)


@pytest.mark.parametrize("group", [2, 5, 10])
def test_matches_flax_whole(setup, group):
    net, params, x, y_ref = setup
    y = np.asarray(resnetv2_apply_fused(params, x, n_blocks=10, max_d_rate=4,
                                        group=group))
    np.testing.assert_allclose(y, y_ref, atol=5e-4)


@pytest.mark.parametrize("batch_group", [2, 3])
def test_matches_flax_whole_batch_grouped(setup, batch_group):
    """batch_group > 1 (multi-row grid cells; includes a non-divisor of B
    exercising the batch pad/trim) is numerics-identical."""
    net, params, x, y_ref = setup
    y = np.asarray(resnetv2_apply_fused(params, x, n_blocks=10, max_d_rate=4,
                                        batch_group=batch_group))
    np.testing.assert_allclose(y, y_ref, atol=5e-4)


@pytest.mark.slow  # >25 s on a contended CPU (r4 VERDICT #8 durations pass)
@pytest.mark.parametrize("ln_mode", ["slice", "matmul"])
def test_matches_flax_pack2(setup, ln_mode):
    """The lane-packed two-rows-per-cell kernel (block-diagonal weights,
    segmented LN) is numerics-identical to flax; also with an odd batch
    (row pad/trim)."""
    net, params, x, y_ref = setup
    y = np.asarray(resnetv2_apply_fused(params, x, n_blocks=10, max_d_rate=4,
                                        pack2=True, pack2_ln=ln_mode))
    np.testing.assert_allclose(y, y_ref, atol=5e-4)
    y1 = np.asarray(resnetv2_apply_fused(params, x[:1], n_blocks=10,
                                         max_d_rate=4, pack2=True,
                                         pack2_ln=ln_mode))
    np.testing.assert_allclose(y1, y_ref[:1], atol=5e-4)


@pytest.mark.slow  # >25 s on a contended CPU (r4 VERDICT #8 durations pass)
def test_whole_and_halo_paths_agree(setup):
    """The two kernels agree to float rounding (measured bit-exact on
    hardware for the flagship config when the whole path was introduced;
    interpret mode shows ~5e-6 op-order noise)."""
    net, params, x, y_ref = setup
    y_h = np.asarray(resnetv2_apply_fused(params, x, n_blocks=10,
                                          max_d_rate=4, whole_max_t=0))
    y_w = np.asarray(resnetv2_apply_fused(params, x, n_blocks=10,
                                          max_d_rate=4))
    np.testing.assert_allclose(y_w, y_h, atol=1e-4)


@pytest.mark.parametrize("whole_max_t", [0, 1024])
def test_causality_preserved(setup, whole_max_t):
    net, params, x, y_ref = setup
    x2 = x.at[0, 60].set(x[0, 60] + 5.0)
    y2 = np.asarray(resnetv2_apply_fused(params, x2, n_blocks=10, max_d_rate=4,
                                         group=5, tile_t=64,
                                         whole_max_t=whole_max_t))
    np.testing.assert_allclose(y2[0, :60], y_ref[0, :60], atol=5e-4)
    assert np.abs(y2[0, 60:] - y_ref[0, 60:]).max() > 1e-4


def test_halo_guard():
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=10, d_f=16,
                           k=3, max_d_rate=4, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    x = jnp.zeros((1, 64, 257))
    params = net.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError):
        resnetv2_apply_fused(params, x, n_blocks=10, max_d_rate=4,
                             group=10, tile_t=16, whole_max_t=0)


def test_enhancer_with_fused_apply(setup):
    from deepxi_tpu.enhance import make_enhancer
    from deepxi_tpu.inp_tgt import inp_tgt_selector
    net, params, _, _ = setup
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(1).randn(64, 257)) ** 2).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    w = (np.random.RandomState(2).randn(2, 256 * 32) * 3000).astype(np.int16)
    ref = make_enhancer(it, net, "mmse-lsa")(params, jnp.asarray(w))
    fused_apply = lambda p, m: resnetv2_apply_fused(p, m, n_blocks=10,
                                                    max_d_rate=4, group=5,
                                                    tile_t=64)
    fast = make_enhancer(it, net, "mmse-lsa", apply_fn=fused_apply)(
        params, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-3)


def test_framework_fast_infer_with_fused(tmp_path):
    """infer(out_type='y') with cfg.tcn_fused routes through the fused
    kernel and matches the per-utterance path."""
    import os
    import jax
    from deepxi_tpu.config import Config
    from deepxi_tpu.data import read_wav, save_wav
    from deepxi_tpu.framework import DeepXiTPU
    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.models import network_selector
    from deepxi_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    set_dir = tmp_path / "set"
    save_wav(str(set_dir / "tx" / "a_white_5dB.wav"),
             (rng.randn(9000) * 3000).astype(np.int16), 16000)
    cfg = Config(ver="tiny", network_type="ResNetV2", d_model=32, n_blocks=3,
                 d_f=16, k=3, max_d_rate=2, causal=True,
                 unit_type="ReLU->LN->W+b", tcn_fused=True,
                 data_path=str(tmp_path / "data"),
                 model_path=str(tmp_path / "model"),
                 log_path=str(tmp_path / "log"), out_path=str(tmp_path / "out"),
                 test_x_path=str(set_dir / "tx"))
    dx = DeepXiTPU.__new__(DeepXiTPU)
    dx.cfg = cfg
    dx.inp_tgt = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                                  map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(rng.randn(32, 257)) ** 2).astype(np.float32)
    dx.inp_tgt = dx.inp_tgt.replace(
        xi_map=dx.inp_tgt.xi_map.with_stats(jnp.asarray(sample)))
    dx.network = network_selector("ResNetV2", 257, **cfg.network_kwargs())
    dx.mesh = make_mesh(1, 1)
    params = dx.network.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 257)))
    fast = dx.infer(params=params, out_type="y", epochs=[1], gains=["mmse-lsa"])
    w_fast, _ = read_wav(fast[0])
    os.rename(fast[0], fast[0] + ".f.wav")
    slow = dx.infer(params=params, out_type="y", epochs=[1], gains=["mmse-lsa"],
                    fast=False)
    w_slow, _ = read_wav(slow[0])
    n = min(len(w_fast), len(w_slow))
    # fused kernel uses default matmul precision; tolerance is audio-level
    diff = np.abs(w_fast[:n].astype(np.int32) - w_slow[:n].astype(np.int32))
    assert diff.max() <= 64, diff.max()  # < 0.2% of int16 range
