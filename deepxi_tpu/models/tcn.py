"""Residual temporal convolutional networks (ref: deepxi/network/tcn.py).

Flax implementations of the Deep Xi ResNet family: bottleneck residual
blocks with the cyclic dilation schedule d_i = 2^(i mod (log2(max_d_rate)+1))
(ref: deepxi/network/tcn.py:53-54,156-157). Causality is a static config:
causal convs left-pad (k-1)*d (Keras 'causal'), non-causal pad symmetrically
(Keras 'same').

TPU notes: a 1-D dilated conv over [B, T, C] lowers to an implicit-GEMM on
the MXU; frame-wise LayerNorm (per (b, t) over channels) has no cross-time
statistics, so padded frames never contaminate valid ones for the causal
models. All shapes static; no data-dependent control flow.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def cyclic_dilation(i: int, max_d_rate: int) -> int:
    """Dilation for block i: cycles 1,2,...,max_d_rate,1,2,...
    (ref: deepxi/network/tcn.py:53-54)."""
    return int(2 ** (i % (math.log2(max_d_rate) + 1)))


def conv1d(features: int, k: int, d_rate: int, causal: bool, use_bias: bool,
           name: str) -> nn.Conv:
    """1-D conv over [B, T, C] with Keras 'causal'/'same' padding semantics."""
    if k == 1:
        padding = "VALID"
    elif causal:
        padding = [((k - 1) * d_rate, 0)]
    else:
        total = (k - 1) * d_rate
        padding = [(total // 2, total - total // 2)]
    return nn.Conv(features, kernel_size=(k,), kernel_dilation=(d_rate,),
                   padding=padding, use_bias=use_bias, name=name)


def output_activation(x: jnp.ndarray, outp_act: str) -> jnp.ndarray:
    """Shared output head activation (ref: deepxi/network/tcn.py:58-61).

    Softplus is an extension beyond the reference's Sigmoid/ReLU/Linear
    taxonomy: a ReLU output head on a non-negative unbounded target
    (MagSMM's [0, 5] mask) can die at initialisation -- all-negative
    preactivations give exactly-zero gradients and the model collapses to
    silence (observed: MSE pinned at the zero-prediction floor from
    epoch 1). Softplus is its smooth strictly-positive stand-in."""
    if outp_act == "Sigmoid":
        return nn.sigmoid(x)
    if outp_act == "ReLU":
        return nn.relu(x)
    if outp_act == "Softplus":
        return nn.softplus(x)
    if outp_act == "Linear":
        return x
    raise ValueError(f"Invalid outp_act: {outp_act!r}")


def frame_layer_norm(x: jnp.ndarray, scale: bool, center: bool, name: str,
                     module: nn.Module) -> jnp.ndarray:
    """Frame-wise LayerNorm over the channel axis, Keras
    ``LayerNormalization(axis=2, epsilon=1e-6)`` semantics."""
    return nn.LayerNorm(epsilon=1e-6, use_scale=scale, use_bias=center,
                        name=name)(x)


class ResNet(nn.Module):
    """Original Deep Xi ResNet (1.0c/1.0n): LN with scale+centre, no bias on
    the bottleneck convs except the block-final one (ref: deepxi/network/tcn.py:17-114).
    """
    n_outp: int
    n_blocks: int = 40
    d_model: int = 256
    d_f: int = 64
    k: int = 3
    max_d_rate: int = 16
    causal: bool = True
    outp_act: str = "Sigmoid"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Feedforward in-projection: conv(no bias) -> LN -> ReLU
        # (ref: deepxi/network/tcn.py:63-76).
        x = conv1d(self.d_model, 1, 1, self.causal, False, "ff_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="ff_ln")(x)
        x = nn.relu(x)

        def unit(h, n_filt, k, d_rate, use_bias, name):
            # LN -> ReLU -> conv (ref: deepxi/network/tcn.py:96-114).
            h = nn.LayerNorm(epsilon=1e-6, name=f"{name}_ln")(h)
            h = nn.relu(h)
            return conv1d(n_filt, k, d_rate, self.causal, use_bias, f"{name}_conv")(h)

        for i in range(self.n_blocks):
            d = cyclic_dilation(i, self.max_d_rate)
            h = unit(x, self.d_f, 1, 1, False, f"block{i}_u1")
            h = unit(h, self.d_f, self.k, d, False, f"block{i}_u2")
            h = unit(h, self.d_model, 1, 1, True, f"block{i}_u3")
            x = x + h

        x = conv1d(self.n_outp, 1, 1, self.causal, True, "out_conv")(x)
        return output_activation(x, self.outp_act)


class ResNetV2(nn.Module):
    """ResNetV2 (resnet-1.1c/1.1n): stat-only LN (no scale/centre) in units to
    reduce overfitting; all convs biased; selectable unit order
    (ref: deepxi/network/tcn.py:116-225). resnet-1.1c: 40 blocks, d_model 256,
    d_f 64, k 3, max_d_rate 16 => 1,949,953 params (ref: log/summary/resnet-1.1c.txt).
    """
    n_outp: int
    n_blocks: int = 40
    d_model: int = 256
    d_f: int = 64
    k: int = 3
    max_d_rate: int = 16
    causal: bool = True
    unit_type: str = "ReLU->LN->W+b"
    outp_act: str = "Sigmoid"

    def feedforward(self, x: jnp.ndarray) -> jnp.ndarray:
        # conv(bias) -> LN(scale only) -> ReLU (ref: deepxi/network/tcn.py:166-180).
        x = conv1d(self.d_model, 1, 1, self.causal, True, "ff_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, use_scale=True, use_bias=False, name="ff_ln")(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.feedforward(x)

        def unit(h, n_filt, k, d_rate, name):
            # (ref: deepxi/network/tcn.py:199-225)
            if self.unit_type == "LN->ReLU->W+b":
                h = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False,
                                 name=f"{name}_ln")(h)
                h = nn.relu(h)
            elif self.unit_type == "ReLU->LN->W+b":
                h = nn.relu(h)
                h = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False,
                                 name=f"{name}_ln")(h)
            else:
                raise ValueError(f"Invalid unit_type: {self.unit_type!r}")
            return conv1d(n_filt, k, d_rate, self.causal, True, f"{name}_conv")(h)

        for i in range(self.n_blocks):
            d = cyclic_dilation(i, self.max_d_rate)
            h = unit(x, self.d_f, 1, 1, f"block{i}_u1")
            h = unit(h, self.d_f, self.k, d, f"block{i}_u2")
            h = unit(h, self.d_model, 1, 1, f"block{i}_u3")
            x = x + h

        x = conv1d(self.n_outp, 1, 1, self.causal, True, "out_conv")(x)
        return output_activation(x, self.outp_act)


class ResNetV3(ResNetV2):
    """ResNetV3: corrected first layer conv -> ReLU -> LN
    (ref: deepxi/network/tcn.py:227-245)."""

    def feedforward(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv1d(self.d_model, 1, 1, self.causal, True, "ff_conv")(x)
        x = nn.relu(x)
        return nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False,
                            name="ff_ln")(x)
