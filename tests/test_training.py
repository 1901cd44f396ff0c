"""Trainer tests: masked loss semantics, optimizer selection, schedule,
train-step convergence, checkpoint save/restore with optimizer state."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deepxi_tpu.inp_tgt import inp_tgt_selector
from deepxi_tpu.models import network_selector
from deepxi_tpu.training import (TrainState, append_loss_csv, make_optimizer,
                                 make_train_step, masked_loss,
                                 restore_checkpoint, save_checkpoint,
                                 transformer_schedule)

DIMS = dict(N_d=512, N_s=256, K=512, f_s=16000)


def tiny_setup():
    it = inp_tgt_selector("MagXi", **DIMS, map_type="DBNormalCDF", map_params=None)
    rng = np.random.RandomState(0)
    sample = (np.abs(rng.randn(64, 257)) ** 2).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    net = network_selector("ResNetV2", 257, d_model=32, n_blocks=4, d_f=16, k=3,
                           max_d_rate=4, causal=True, unit_type="ReLU->LN->W+b",
                           outp_act="Sigmoid")
    return it, net


class TestMaskedLoss:
    def test_bce_matches_manual(self):
        rng = np.random.RandomState(1)
        pred = jnp.asarray(rng.uniform(0.01, 0.99, (2, 4, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(0, 1, (2, 4, 3)).astype(np.float32))
        mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
        out = float(masked_loss(pred, tgt, mask, "BinaryCrossentropy"))
        p, t = np.asarray(pred), np.asarray(tgt)
        frame = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean(-1)
        manual = (frame * np.asarray(mask)).mean()
        assert abs(out - manual) < 1e-6

    def test_mse_and_invalid(self):
        pred = jnp.ones((1, 2, 3)) * 0.5
        tgt = jnp.zeros((1, 2, 3))
        mask = jnp.ones((1, 2))
        assert abs(float(masked_loss(pred, tgt, mask, "MeanSquaredError")) - 0.25) < 1e-6
        with pytest.raises(ValueError):
            masked_loss(pred, tgt, mask, "Huber")

    def test_padding_does_not_affect_loss(self):
        pred = jnp.ones((1, 4, 3)) * 0.3
        tgt = jnp.zeros((1, 4, 3))
        m1 = jnp.asarray([[1, 1, 0, 0]], jnp.float32)
        l1 = float(masked_loss(pred, tgt, m1, "BinaryCrossentropy"))
        pred2 = pred.at[0, 2:].set(0.99)
        l2 = float(masked_loss(pred2, tgt, m1, "BinaryCrossentropy"))
        assert abs(l1 - l2) < 1e-7


class TestOptimizer:
    def test_transformer_schedule_values(self):
        # rsqrt(d_model)*min(rsqrt(s), s*warmup^-1.5) (ref: deepxi/model.py:2391-2394)
        sched = transformer_schedule(256, 40000)
        for s in [1, 100, 40000, 100000]:
            expect = 256 ** -0.5 * min(s ** -0.5, s * 40000 ** -1.5)
            assert abs(float(sched(jnp.asarray(s))) - expect) < 1e-9

    def test_selection(self):
        assert make_optimizer("MHANetV3", 256, 100) is not None
        assert make_optimizer("ResNetV2") is not None

    def test_clipvalue(self):
        tx = make_optimizer("ResNetV2")
        params = {"w": jnp.zeros(3)}
        state = tx.init(params)
        grads = {"w": jnp.asarray([100.0, -50.0, 0.5])}
        updates, _ = tx.update(grads, state, params)
        # after elementwise clip to 1.0 all three grads drive comparable steps
        u = np.abs(np.asarray(updates["w"]))
        assert u.max() <= 1.1e-3  # adam step bounded by lr


class TestTrainStep:
    def test_loss_decreases(self):
        it, net = tiny_setup()
        tx = make_optimizer("ResNetV2")
        rng = np.random.RandomState(2)
        s = (rng.randn(2, 4096) * 3000).astype(np.int16)
        d = (rng.randn(2, 8192) * 1000).astype(np.int16)
        s_len = np.array([4096, 3000], np.int32)
        d_len = np.array([8192, 8192], np.int32)
        snr = np.array([0.0, 5.0], np.float32)

        params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 257)))
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(net, it, tx))
        key = jax.random.PRNGKey(3)
        losses = []
        for i in range(12):
            key, k = jax.random.split(key)
            state, m = step(state, k, jnp.asarray(s), jnp.asarray(d),
                            jnp.asarray(s_len), jnp.asarray(d_len), jnp.asarray(snr))
            losses.append(float(m["loss"]))
        assert int(state.step) == 12
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        it, net = tiny_setup()
        tx = make_optimizer("ResNetV2")
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 257)))
        state = TrainState.create(params, tx)
        state = state.replace(step=jnp.asarray(7, jnp.int32))
        save_checkpoint(str(tmp_path), 3, state)
        template = TrainState.create(
            net.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 257))), tx)
        restored = restore_checkpoint(str(tmp_path), 3, template)
        assert int(restored.step) == 7
        l0 = jax.tree_util.tree_leaves(state.params)
        l1 = jax.tree_util.tree_leaves(restored.params)
        for a, b in zip(l0, l1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # optimizer state restored too (the reference never did this)
        o0 = jax.tree_util.tree_leaves(state.opt_state)
        o1 = jax.tree_util.tree_leaves(restored.opt_state)
        assert len(o0) == len(o1)

    def test_loss_csv_format(self, tmp_path):
        append_loss_csv(str(tmp_path), "v", 0, 0.5, 0.6)
        append_loss_csv(str(tmp_path), "v", 1, 0.4, 0.5)
        lines = open(os.path.join(tmp_path, "loss", "v.csv")).read().strip().split("\n")
        assert lines[0] == "epoch,loss,val_loss"
        assert lines[1].startswith("0,0.5")
