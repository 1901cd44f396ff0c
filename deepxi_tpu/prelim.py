"""Synthetic sanity harness (ref: deepxi/prelim.py:18-98): trains a network
on random sequences with a known constant target and reports
target-vs-prediction -- a smoke test of network + masking + trainer plumbing
that needs no audio data. Reachable via ``--prelim`` like the reference
declares (ref: deepxi/args.py:39)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepxi_tpu.models import network_selector
from deepxi_tpu.training import TrainState, make_optimizer, masked_loss


def run_prelim(network_type: str = "ResNetV2", n_steps: int = 50,
               batch: int = 4, T: int = 32, n_feat: int = 257,
               target_value: float = 0.75, seed: int = 0,
               verbose: bool = True, **net_kwargs) -> Tuple[float, float]:
    """Train briefly on random inputs with a constant target.

    Returns (final_loss, mean_abs_error) -- the prediction should approach
    ``target_value`` everywhere.
    """
    defaults = dict(d_model=32, n_blocks=4, d_f=16, k=3, max_d_rate=4,
                    causal=True, unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    defaults.update(net_kwargs)
    net = network_selector(network_type, n_feat, **{
        k: v for k, v in defaults.items() if v is not None})
    tx = make_optimizer(network_type, defaults.get("d_model") or 32, 4000)

    rng = np.random.RandomState(seed)
    lengths = rng.randint(T // 2, T + 1, batch)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)

    params = net.init(jax.random.PRNGKey(seed), jnp.zeros((batch, T, n_feat)))
    state = TrainState.create(params, tx)
    tgt = jnp.full((batch, T, net.n_outp), target_value)
    maskj = jnp.asarray(mask)

    @jax.jit
    def step(state, key):
        inp = jnp.abs(jax.random.normal(key, (batch, T, n_feat))) * maskj[..., None]

        def loss_fn(p):
            return masked_loss(net.apply(p, inp), tgt, maskj, "MeanSquaredError")

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(step=state.step + 1,
                             params=optax.apply_updates(state.params, updates),
                             opt_state=opt_state), loss

    key = jax.random.PRNGKey(seed + 1)
    loss = jnp.inf
    for i in range(n_steps):
        key, k = jax.random.split(key)
        state, loss = step(state, k)
        if verbose and i % 10 == 0:
            print(f"prelim step {i}: loss {float(loss):.5f}")

    inp = jnp.abs(jax.random.normal(key, (batch, T, n_feat))) * maskj[..., None]
    pred = net.apply(state.params, inp)
    mae = float(jnp.sum(jnp.abs(pred - tgt) * maskj[..., None])
                / (jnp.sum(maskj) * net.n_outp))
    if verbose:
        print(f"prelim: target {target_value} mean|pred-target| {mae:.4f}")
    return float(loss), mae
