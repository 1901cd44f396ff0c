"""Mesh/sharding tests on the virtual 8-device CPU mesh (SURVEY.md section 4:
multi-device tests via xla_force_host_platform_device_count)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.parallel import (batch_sharding, make_mesh, param_sharding,
                                 shard_batch, shard_params)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


class TestMesh:
    def test_mesh_shapes(self, devices):
        m = make_mesh()
        assert m.shape == {"data": 8, "model": 1}
        m2 = make_mesh(n_data=4, n_model=2)
        assert m2.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(n_data=8, n_model=2)

    def test_batch_sharded_over_data(self, devices):
        m = make_mesh()
        x = np.zeros((16, 10), np.float32)
        xs = shard_batch(m, x)
        assert xs.sharding == batch_sharding(m)
        assert len(xs.addressable_shards) == 8
        assert xs.addressable_shards[0].data.shape == (2, 10)

    def test_param_sharding_model_axis(self, devices):
        m = make_mesh(n_data=4, n_model=2)
        kernel = np.zeros((3, 64, 128), np.float32)
        sh = param_sharding(m, kernel)
        k = jax.device_put(kernel, sh)
        # output channels split over the 2 model shards
        assert k.addressable_shards[0].data.shape == (3, 64, 64)

    def test_data_parallel_train_step(self, devices):
        """Full dp train step over the 8-device mesh: gradients reduce via
        XLA-inserted collectives, loss matches single-device execution."""
        from deepxi_tpu.inp_tgt import inp_tgt_selector
        from deepxi_tpu.models import network_selector
        from deepxi_tpu.training import TrainState, make_optimizer, make_train_step

        it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                              map_type="DBNormalCDF", map_params=None)
        sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2).astype(np.float32)
        it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
        net = network_selector("ResNetV2", 257, d_model=32, n_blocks=2, d_f=16,
                               k=3, max_d_rate=2, causal=True,
                               unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
        tx = make_optimizer("ResNetV2")
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 257)))
        mesh = make_mesh()
        params_sh = shard_params(mesh, params)
        state = TrainState.create(params_sh, tx)
        step = jax.jit(make_train_step(net, it, tx))

        rng = np.random.RandomState(1)
        s = (rng.randn(8, 4096) * 3000).astype(np.int16)
        d = (rng.randn(8, 8192) * 1000).astype(np.int16)
        s_len = np.full(8, 4096, np.int32)
        d_len = np.full(8, 8192, np.int32)
        snr = np.zeros(8, np.float32)
        batch = shard_batch(mesh, (jnp.asarray(s), jnp.asarray(d)))
        key = jax.random.PRNGKey(2)

        state2, m1 = step(state, key, batch[0], batch[1], jnp.asarray(s_len),
                          jnp.asarray(d_len), jnp.asarray(snr))
        # unsharded single-device reference
        state_ref = TrainState.create(params, tx)
        state_ref2, m2 = step(state_ref, key, jnp.asarray(s), jnp.asarray(d),
                              jnp.asarray(s_len), jnp.asarray(d_len),
                              jnp.asarray(snr))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        a = jax.tree_util.tree_leaves(state2.params)[0]
        b = jax.tree_util.tree_leaves(state_ref2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip(self, devices):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestMHANetMesh:
    def test_mhanet_dp_tp_train_step(self, devices):
        """MHANetV3 training step over a dp x tp mesh (attention einsum
        kernels shard their output axes over 'model')."""
        from deepxi_tpu.inp_tgt import inp_tgt_selector
        from deepxi_tpu.models import network_selector
        from deepxi_tpu.training import TrainState, make_optimizer, make_train_step

        it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                              map_type="DBNormalCDF", map_params=None)
        sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2).astype(np.float32)
        it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
        net = network_selector("MHANetV3", 257, d_model=32, n_blocks=2,
                               n_heads=4, causal=True, outp_act="Sigmoid",
                               max_len=64)
        tx = make_optimizer("MHANetV3", 32, 100)
        mesh = make_mesh(n_data=4, n_model=2)
        params = shard_params(mesh, net.init(jax.random.PRNGKey(0),
                                             jnp.zeros((4, 16, 257))))
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(net, it, tx))
        rng = np.random.RandomState(2)
        s = (rng.randn(4, 4096) * 3000).astype(np.int16)
        d = (rng.randn(4, 8192) * 1000).astype(np.int16)
        batch = shard_batch(mesh, (jnp.asarray(s), jnp.asarray(d)))
        state, m = step(state, jax.random.PRNGKey(3), batch[0], batch[1],
                        jnp.full(4, 4096, jnp.int32), jnp.full(4, 8192, jnp.int32),
                        jnp.zeros(4))
        assert np.isfinite(float(m["loss"]))


class TestDistributedInit:
    """init_distributed error policy (round-1 weak item): explicit
    multi-host arguments must make failures fatal; only auto-detection may
    fall back to single-process."""

    def test_explicit_args_propagate_failure(self, monkeypatch):
        from deepxi_tpu.parallel import distributed

        def boom(**kw):
            raise RuntimeError("coordinator unreachable")
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="coordinator"):
            distributed.init_distributed(
                coordinator_address="10.0.0.1:1234", num_processes=4,
                process_id=0)

    def test_auto_detect_falls_back_quietly(self, monkeypatch, caplog):
        import logging

        from deepxi_tpu.parallel import distributed

        def boom():
            raise RuntimeError("no cluster env")
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with caplog.at_level(logging.INFO,
                             logger="deepxi_tpu.parallel.distributed"):
            distributed.init_distributed()  # must not raise
        assert any("single-process" in r.message for r in caplog.records)
