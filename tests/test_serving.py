"""AOT serving exports (deepxi_tpu/serving.py): serialized StableHLO
artifacts must reproduce the live fused pipeline and survive a
bytes-on-disk round trip with no model code in the loading path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.enhance import make_enhancer
from deepxi_tpu.inp_tgt import inp_tgt_selector
from deepxi_tpu.models import network_selector
from deepxi_tpu.serving import export_enhancer, load_server


@pytest.fixture(scope="module")
def small(tmp_path_factory):
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=4, d_f=16,
                           k=3, max_d_rate=4, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
              ).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 257)))
    out = str(tmp_path_factory.mktemp("export"))
    paths = export_enhancer(it, net, params, out, batch=4,
                            buckets=(8192, 16384), ver="test-tiny")
    return it, net, params, out, paths


def test_export_writes_artifacts(small):
    _, _, _, out, paths = small
    assert len(paths) == 2
    import os
    assert os.path.exists(os.path.join(out, "manifest.json"))
    for p in paths:
        assert os.path.getsize(p) > 1000


def test_server_matches_live_pipeline(small):
    it, net, params, out, _ = small
    server = load_server(out)
    n = 10000  # forces the 16384 bucket and pad/trim
    x = (np.random.RandomState(1).randn(2, n) * 3000).astype(np.int16)
    y_srv = server(x)
    live = make_enhancer(it, net, "mmse-lsa")
    L = server.bucket_for(n)
    xp = np.zeros((4, L), np.int16)
    xp[:2, :n] = x
    y_live = np.asarray(live(params, jnp.asarray(xp)))[:2, : y_srv.shape[1]]
    np.testing.assert_allclose(y_srv, y_live, atol=1e-6)


@pytest.mark.slow  # >25 s on a contended CPU (r4 VERDICT #8 durations pass)
def test_framework_export_serving(tmp_path):
    """DeepXiTPU.export_serving end-to-end: train a tiny model one epoch,
    export the checkpoint, reload with no model objects, enhance."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_framework import tiny_cfg

    from deepxi_tpu.data import batch_list
    from deepxi_tpu.data.wavio import save_wav
    from deepxi_tpu.framework import DeepXiTPU

    root = tmp_path
    rng = np.random.RandomState(0)
    for sub in ("train_clean_speech", "train_noise"):
        os.makedirs(root / "set" / sub, exist_ok=True)
    for i in range(2):
        save_wav(str(root / "set" / "train_clean_speech" / f"s{i}.wav"),
                 (rng.randn(12000) * 4000).astype(np.int16), 16000)
        save_wav(str(root / "set" / "train_noise" / f"d{i}.wav"),
                 (rng.randn(20000) * 2000).astype(np.int16), 16000)
    cfg = tiny_cfg(root, val_flag=False)
    s_list = batch_list(os.path.join(cfg.set_path, "train_clean_speech"),
                        "clean_speech", cfg.data_path)
    d_list = batch_list(os.path.join(cfg.set_path, "train_noise"),
                        "noise", cfg.data_path)
    dx = DeepXiTPU(cfg, s_list, d_list)
    dx.train(verbose=False)
    out = str(root / "serving")
    written = dx.export_serving(out_dir=out, batch=2, buckets=(8192,))
    assert len(written) == 1
    server = load_server(out)
    y = server((rng.randn(1, 6000) * 3000).astype(np.int16))
    assert y.shape[0] == 1 and np.isfinite(y).all()


def test_multichip_export_roundtrip(small, tmp_path):
    """mesh= export: the artifact records the dp shardings (nr_devices=8 on
    the virtual CPU mesh), load_server demands a matching mesh, and the
    sharded result equals the single-device server's."""
    from deepxi_tpu.parallel import make_mesh

    it, net, params, out_single, _ = small
    mesh = make_mesh(n_data=8, n_model=1)
    out = str(tmp_path / "mc")
    export_enhancer(it, net, params, out, batch=8, buckets=(8192,),
                    mesh=mesh, ver="test-mc")
    with pytest.raises(ValueError, match="8 devices"):
        load_server(out)  # mesh required
    server = load_server(out, mesh=mesh)
    x = (np.random.RandomState(2).randn(3, 6000) * 3000).astype(np.int16)
    y_mc = server(x)
    y_1 = load_server(out_single)(x)
    np.testing.assert_allclose(y_mc, y_1[:, : y_mc.shape[1]], atol=2e-5)


def test_server_rejects_oversize(small):
    _, _, _, out, _ = small
    server = load_server(out)
    with pytest.raises(ValueError, match="exceeds"):
        server(np.zeros((1, 20000), np.int16))
    with pytest.raises(ValueError, match="batch"):
        server(np.zeros((5, 1000), np.int16))
