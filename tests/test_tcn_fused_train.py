"""Differentiable fused TCN (ops/kernels/tcn_fused_train.py): forward AND
gradients of the custom-VJP Pallas stack must match jax.grad of the flax
ResNetV2 twin (CPU interpret mode, f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepxi_tpu.models import network_selector
from deepxi_tpu.ops.kernels.tcn_fused_train import resnetv2_apply_fused_train

N_BLOCKS, MAX_D, K, D_MODEL, D_F = 5, 4, 3, 32, 16


@pytest.fixture(scope="module")
def setup():
    net = network_selector("ResNetV2", 17, d_model=D_MODEL,
                           n_blocks=N_BLOCKS, d_f=D_F, k=K,
                           max_d_rate=MAX_D, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    x = jnp.asarray(np.random.RandomState(0).randn(3, 40, 17)
                    .astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    tgt = jnp.asarray(np.random.RandomState(1).rand(3, 40, 17)
                      .astype(np.float32))
    return net, params, x, tgt


def fused_apply(p, m):
    return resnetv2_apply_fused_train(p, m, n_blocks=N_BLOCKS,
                                      max_d_rate=MAX_D, k=K, group=2)


def test_forward_matches(setup):
    net, params, x, _ = setup
    np.testing.assert_allclose(np.asarray(fused_apply(params, x)),
                               np.asarray(net.apply(params, x)), atol=1e-5)


@pytest.mark.parametrize("save_acts", [
    pytest.param(False, marks=pytest.mark.slow),  # replay backward: 30 s
    True,  # save_acts is the production default -- stays fast
])
def test_gradients_match_flax(setup, save_acts):
    """Both backward strategies (in-kernel forward replay, and replay-free
    via activations recorded by the saving forward) match jax.grad."""
    net, params, x, tgt = setup

    def fused(p, m):
        return resnetv2_apply_fused_train(p, m, n_blocks=N_BLOCKS,
                                          max_d_rate=MAX_D, k=K, group=2,
                                          save_acts=save_acts)

    def loss(apply_fn):
        def f(p):
            pred = apply_fn(p, x)
            return jnp.mean(jnp.square(pred - tgt))
        return f

    l_ref, g_ref = jax.value_and_grad(loss(net.apply))(params)
    l_fus, g_fus = jax.value_and_grad(loss(fused))(params)
    np.testing.assert_allclose(float(l_fus), float(l_ref), atol=1e-6)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fus = jax.tree_util.tree_leaves(g_fus)
    assert len(flat_ref) == len(flat_fus)
    for (path, r), f in zip(flat_ref, flat_fus):
        scale = max(float(jnp.abs(r).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), atol=2e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_train_step_integration():
    """make_train_step(apply_fn=fused) runs and reduces the loss."""
    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.training import (TrainState, make_optimizer,
                                     make_train_step)

    net = network_selector("ResNetV2", 257, d_model=D_MODEL, n_blocks=3,
                           d_f=D_F, k=K, max_d_rate=2, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2
              ).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    tx = make_optimizer("ResNetV2")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 257)))
    state = TrainState.create(params, tx)
    fused = lambda p, m: resnetv2_apply_fused_train(
        p, m, n_blocks=3, max_d_rate=2, k=K, group=2)
    step = jax.jit(make_train_step(net, it, tx, apply_fn=fused))

    rng = np.random.RandomState(5)
    s = jnp.asarray((rng.randn(2, 8192) * 3000).astype(np.int16))
    d = jnp.asarray((rng.randn(2, 8192) * 2000).astype(np.int16))
    lens = jnp.full((2,), 8192, jnp.int32)
    snr = jnp.zeros((2,), jnp.float32)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(4):
        key, k2 = jax.random.split(key)
        state, m = step(state, k2, s, d, lens, lens, snr)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_gradients_match_under_jit_and_mask(setup):
    """As used in the train step: masked BCE loss under jit."""
    net, params, x, tgt = setup
    mask = jnp.asarray([[1.0] * 40, [1.0] * 25 + [0.0] * 15,
                        [1.0] * 40])

    def make(apply_fn):
        @jax.jit
        def f(p):
            pred = jnp.clip(apply_fn(p, x), 1e-7, 1 - 1e-7)
            frame = -jnp.mean(tgt * jnp.log(pred)
                              + (1 - tgt) * jnp.log(1 - pred), axis=-1)
            return jnp.mean(frame * mask)
        return jax.value_and_grad(f)

    l_ref, g_ref = make(net.apply)(params)
    l_fus, g_fus = make(fused_apply)(params)
    np.testing.assert_allclose(float(l_fus), float(l_ref), atol=1e-6)
    for r, f in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        scale = max(float(jnp.abs(r).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   atol=2e-4 * scale)
