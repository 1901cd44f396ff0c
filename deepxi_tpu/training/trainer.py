"""Training loop: jitted, mesh-sharded train step with masked losses,
reference-matching optimizers, per-epoch checkpointing with resume
(ref: deepxi/model.py:113-222, 2377-2398).

Deviations from the reference are deliberate and TPU-idiomatic:

  * the whole example pipeline (SNR mix -> STFT -> map) runs *inside* the
    jitted train step on device -- the reference synthesises examples on the
    host generator thread (ref: deepxi/model.py:1985-2012);
  * randomness is a threaded jax PRNG key (fully deterministic given seed);
  * optimizer state is restored on resume (the reference saves it but only
    ever reloads weights -- a catalogued quirk, ref: deepxi/model.py:176-177);
  * sequence lengths are bucketed to a small set of static shapes instead of
    pad-to-longest, bounding XLA recompilation.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from deepxi_tpu.parallel import mesh as meshlib


def transformer_schedule(d_model: int, warmup_steps: int) -> optax.Schedule:
    """rsqrt(d_model) * min(rsqrt(step), step * warmup^-1.5)
    (ref: deepxi/model.py:2385-2398)."""
    def sched(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        return (d_model ** -0.5) * jnp.minimum(step ** -0.5,
                                               step * (warmup_steps ** -1.5))
    return sched


def make_optimizer(network_type: str, d_model: int = 256,
                   warmup_steps: int = 40000) -> optax.GradientTransformation:
    """Reference optimizer selection (ref: deepxi/model.py:194-200): Adam with
    element-wise gradient clipvalue 1.0; MHA nets use the Transformer schedule
    with beta2=0.98, eps=1e-9."""
    if "MHA" in network_type:
        return optax.chain(
            optax.clip(1.0),
            optax.adam(transformer_schedule(d_model, warmup_steps),
                       b1=0.9, b2=0.98, eps=1e-9))
    return optax.chain(optax.clip(1.0), optax.adam(1e-3))


def masked_loss(pred: jnp.ndarray, tgt: jnp.ndarray, seq_mask: jnp.ndarray,
                loss_fnc: str) -> jnp.ndarray:
    """Keras loss with ``sample_weight_mode="temporal"`` semantics
    (ref: deepxi/model.py:206-211): per-frame loss (mean over bins), weighted
    by the sequence mask, averaged over the full padded [B, T] grid."""
    if loss_fnc == "BinaryCrossentropy":
        eps = 1e-7  # Keras backend epsilon
        p = jnp.clip(pred, eps, 1.0 - eps)
        frame = -jnp.mean(tgt * jnp.log(p) + (1.0 - tgt) * jnp.log(1.0 - p), axis=-1)
    elif loss_fnc == "MeanSquaredError":
        frame = jnp.mean(jnp.square(pred - tgt), axis=-1)
    else:
        raise ValueError(f"Invalid loss function: {loss_fnc!r}")
    return jnp.mean(frame * seq_mask)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_train_step(network, inp_tgt, tx,
                    loss_fnc: str = "BinaryCrossentropy",
                    apply_fn: Optional[Callable] = None) -> Callable:
    """Build the fused on-device train step:
    (state, key, s, d, s_len, d_len, snr) -> (state, metrics).

    The example synthesis (mix/STFT/map, ref: deepxi/inp_tgt.py:173-196) is
    traced into the same XLA computation as forward/backward, so the only
    host->device transfer per step is the raw int16 waveforms.

    apply_fn optionally replaces network.apply with a differentiable fused
    forward (e.g. kernels.tcn_fused_train.resnetv2_apply_fused_train).
    """
    net_apply = apply_fn if apply_fn is not None else network.apply

    def loss_fn(params, key, s, d, s_len, d_len, snr):
        inp, tgt, n_frames = inp_tgt.example(key, s, d, s_len, d_len, snr)
        T = inp.shape[1]
        seq_mask = (jnp.arange(T)[None, :] < n_frames[:, None]).astype(jnp.float32)
        pred = net_apply(params, inp)
        return masked_loss(pred, tgt, seq_mask, loss_fnc)

    def train_step(state: TrainState, key, s, d, s_len, d_len, snr):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key, s, d,
                                                  s_len, d_len, snr)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, {"loss": loss}

    return train_step


def make_phoneme_train_step(network, inp_tgt, tx) -> Callable:
    """Train step for the phoneme-classifier mode (MagPhonemes): targets are
    per-frame label one-hots carried by the labelled loader
    (ref: deepxi/model.py:2061-2112 phoneme_mbatch_gen_aug). Signature:
    (state, key, s, d, s_len, d_len, snr, labels) -> (state, metrics)."""

    def loss_fn(params, key, s, d, s_len, d_len, snr, labels):
        inp, tgt, n_frames = inp_tgt.example(key, s, d, s_len, d_len, snr,
                                             labels=labels)
        T = inp.shape[1]
        seq_mask = (jnp.arange(T)[None, :] < n_frames[:, None]).astype(jnp.float32)
        pred = network.apply(params, inp)
        return masked_loss(pred, tgt, seq_mask, "BinaryCrossentropy")

    def train_step(state: TrainState, key, s, d, s_len, d_len, snr, labels):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, key, s, d, s_len, d_len, snr, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), {"loss": loss}

    return train_step


def make_eval_step(network, inp_tgt, loss_fnc: str = "BinaryCrossentropy"):
    """Validation step on precomputed (inp, tgt, seq_mask) batches
    (ref: deepxi/model.py:2190-2230)."""

    def eval_step(params, inp, tgt, seq_mask):
        pred = network.apply(params, inp)
        return masked_loss(pred, tgt, seq_mask, loss_fnc)

    return eval_step


# ---------------------------------------------------------------------------
# Checkpointing (orbax): per-epoch full state with resume
# ---------------------------------------------------------------------------

def save_checkpoint(model_dir: str, epoch: int, state: TrainState) -> None:
    """Per-epoch checkpoint, dir layout mirroring the reference's
    ``model/<ver>/epoch-<n>`` (ref: deepxi/model.py:2377-2383)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, f"epoch-{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(model_dir: str, epoch: int,
                       template: TrainState) -> TrainState:
    """Restore params AND optimizer state (fixing the reference's
    load-weights-only resume quirk, ref: deepxi/model.py:176-177)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, f"epoch-{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, jax.device_get(template))


def append_loss_csv(log_path: str, ver: str, epoch: int, loss: float,
                    val_loss: Optional[float] = None) -> None:
    """``log/loss/<ver>.csv`` rows ``epoch,loss[,val_loss]`` in the
    reference's format (ref: deepxi/model.py:171-173)."""
    d = os.path.join(log_path, "loss")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"{ver}.csv")
    new = not os.path.exists(p)
    with open(p, "a") as f:
        if new:
            f.write("epoch,loss" + (",val_loss" if val_loss is not None else "") + "\n")
        row = f"{epoch},{loss}"
        if val_loss is not None:
            row += f",{val_loss}"
        f.write(row + "\n")
