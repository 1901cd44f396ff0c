"""Residual-dense lattice network, RDLNet (AAAI'20)
(ref: deepxi/network/rdlnet.py:13-164).

A triangular lattice of convolutional units per block: at height h the unit
has m_1/2^h filters, kernel 2(h+1)-1 and dilation 2^h
(ref: deepxi/network/rdlnet.py:77-79); residual links project the larger
tensor to the smaller width with a bias-free 1x1 conv
(ref: deepxi/network/rdlnet.py:120-136); dense links concatenate lattice
neighbours; each block's output is concatenated with its input
(ref: deepxi/network/rdlnet.py:47-49). Preset rdlnet-1.0n: 18 blocks,
length 7 (ref: run.sh rdlnet-1.0n preset).

Note: the reference's descending-half loop contains fork defects (a unit
computed from the wrong input and immediately overwritten,
ref: deepxi/network/rdlnet.py:101-107); we implement the intended symmetric
descent (catalogued in SURVEY.md as a defect not to reproduce). No shipped
checkpoint exists for RDLNet, so parity is architectural (unit widths/
kernels/dilations), not bitwise.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from deepxi_tpu.models.tcn import conv1d, output_activation


class RDLNet(nn.Module):
    n_outp: int
    n_blocks: int = 18
    length: int = 7
    m_1: int = 32
    causal: bool = False
    unit_type: str = "ReLU->LN->W+b"
    outp_act: str = "Sigmoid"

    def _unit(self, x, h, name):
        """Convolutional unit at lattice height h (ref: deepxi/network/rdlnet.py:138-164)."""
        n_filt = max(self.m_1 // (2 ** h), 1)
        k = 2 * (h + 1) - 1
        d_rate = 2 ** h
        if self.unit_type == "ReLU->LN->W+b":
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False,
                             name=f"{name}_ln")(x)
        else:  # "scale*LN+center->ReLU->W+b" variant applies ReLU directly
            x = nn.relu(x)
        return conv1d(n_filt, k, d_rate, self.causal, True, f"{name}_conv")(x)

    def _weighted_residual(self, x, y, name):
        """Project the wider tensor to the narrower width, then add
        (ref: deepxi/network/rdlnet.py:120-136)."""
        cx, cy = x.shape[-1], y.shape[-1]
        if cx > cy:
            x = conv1d(cy, 1, 1, self.causal, False, f"{name}_proj")(x)
        elif cx < cy:
            y = conv1d(cx, 1, 1, self.causal, False, f"{name}_proj")(y)
        return x + y

    def _block(self, inp, bi):
        L = self.length
        height = (L - 1) // 2 + 1
        midpoint = (L + 1) // 2
        cell = [[None] * L for _ in range(height)]

        # Ascending half (ref: deepxi/network/rdlnet.py:66-95).
        for l in range(midpoint):
            h_order = range(height) if l < midpoint - 1 else reversed(range(height))
            for h in h_order:
                if h > l:
                    continue
                if l == 0:
                    unit_inp = inp
                elif l == h:
                    unit_inp = cell[h - 1][l - 1]
                else:
                    unit_inp = cell[h][l - 1]
                name = f"b{bi}_h{h}_l{l}"
                U = self._unit(unit_inp, h, name)
                if l == h:
                    out = U
                elif h == 0 and l == 1:
                    out = self._weighted_residual(U, inp, name)
                elif h + 1 == l:
                    out = self._weighted_residual(U, cell[h - 1][l - 2], name)
                else:
                    out = self._weighted_residual(U, cell[h][l - 2], name)
                if l == 0 or h == height - 1 or (h == 0 and l < midpoint - 1):
                    pass
                elif l == midpoint - 1:
                    out = jnp.concatenate([out, cell[h + 1][l]], axis=-1)
                else:
                    out = jnp.concatenate([out, cell[h - 1][l]], axis=-1)
                cell[h][l] = out

        # Descending half: symmetric intent of ref: deepxi/network/rdlnet.py:97-116.
        for l in range(midpoint, L):
            for h in reversed(range(height)):
                if h >= L - l:
                    continue
                name = f"b{bi}_h{h}_l{l}"
                U = self._unit(cell[h][l - 1], h, name)
                out = self._weighted_residual(U, cell[h][l - 2], name)
                if l != L - h - 1:
                    out = jnp.concatenate([out, cell[h + 1][l]], axis=-1)
                cell[h][l] = out

        return cell[0][L - 1]

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        x = inp
        for i in range(self.n_blocks):
            x = jnp.concatenate([self._block(x, i), x], axis=-1)
        x = conv1d(self.n_outp, 1, 1, self.causal, True, "out_conv")(x)
        return output_activation(x, self.outp_act)
