"""Residual (Bi)LSTM networks (ref: deepxi/network/rnn.py).

Implements the *upstream-intended* semantics: every residual block is a
single (bi)LSTM over the full sequence with ``return_sequences`` behaviour
(the fork drops ``return_sequences=True`` at ref: deepxi/network/rnn.py:62,97,
which shape-breaks the residual add -- a catalogued defect we do not
reproduce; see SURVEY.md).

Masking: Keras ``Masking(0.0)`` skips masked timesteps -- state is carried
through and the previous output is repeated. We reproduce that with a masked
`nn.scan` carry, which keeps the recurrence a single fused XLA while-loop on
TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepxi_tpu.models.attention import sequence_valid_mask
from deepxi_tpu.models.tcn import output_activation


class _MaskedLSTM(nn.Module):
    """LSTM over [B, T, C] with per-step masking; returns [B, T, d_model]."""
    d_model: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        cell = nn.OptimizedLSTMCell(self.d_model, name="cell")

        def masked_step(cell_mod, carry, inputs):
            state, y_prev = carry
            xt, mt = inputs
            new_state, y = cell_mod(state, xt)
            mt_b = mt[:, None]
            state = jax.tree_util.tree_map(
                lambda ns, s: jnp.where(mt_b, ns, s), new_state, state)
            y = jnp.where(mt_b, y, y_prev)
            return (state, y), y

        scan = nn.scan(masked_step,
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1,
                       reverse=self.reverse)
        init_state = cell.initialize_carry(jax.random.PRNGKey(0), (B, x.shape[-1]))
        y0 = jnp.zeros((B, self.d_model), x.dtype)
        (_, _), ys = scan(cell, (init_state, y0), (x, mask.astype(bool)))
        return ys


class ResLSTM(nn.Module):
    """Residual LSTM network (ref: deepxi/network/rnn.py:13-79).
    reslstm-1.0c: d_model 512, 5 blocks (ref: run.sh reslstm preset)."""
    n_outp: int
    n_blocks: int = 5
    d_model: int = 512
    outp_act: str = "Sigmoid"
    bidirectional: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        mask = sequence_valid_mask(inp)
        # Feedforward in-projection: Dense(no bias) -> LN -> ReLU
        # (ref: deepxi/network/rnn.py:66-79).
        x = nn.Dense(self.d_model, use_bias=False, name="ff_dense")(inp)
        x = nn.LayerNorm(epsilon=1e-6, name="ff_ln")(x)
        x = nn.relu(x)

        for i in range(self.n_blocks):
            if self.bidirectional:
                fwd = _MaskedLSTM(self.d_model, name=f"block{i}_lstm_fwd")(x, mask)
                bwd = _MaskedLSTM(self.d_model, reverse=True,
                                  name=f"block{i}_lstm_bwd")(x, mask)
                h = fwd + bwd  # merge_mode='sum' (ref: deepxi/network/rnn.py:98)
            else:
                h = _MaskedLSTM(self.d_model, name=f"block{i}_lstm")(x, mask)
            x = x + h

        x = nn.Dense(self.n_outp, name="out_dense")(x)
        return output_activation(x, self.outp_act)


class ResBiLSTM(ResLSTM):
    """Residual bidirectional LSTM (ref: deepxi/network/rnn.py:81-100)."""
    bidirectional: bool = True
