"""Streaming (frame-by-frame) causal enhancement.

The reference is strictly offline (whole-utterance `model.predict`,
ref: deepxi/model.py:286); its causal models (resnet-*c, mhanet-*c) are
nevertheless streamable in principle. This module implements real streaming
for the causal ResNet TCN family: a functional per-frame step with explicit
delay-line state for every dilated convolution, plus streaming STFT analysis
and overlap-add synthesis.

Latency: one analysis window (N_d = 32 ms) + one hop (N_s = 16 ms) of
algorithmic delay; each `step` consumes one N_s-sample hop and emits one
N_s-sample hop of enhanced audio.

State layout: for each conv with kernel k and dilation d, a ring buffer of
the last (k-1)*d input frames. Everything is static-shaped and jittable, so
a compiled `step` can serve real-time audio; `lax.scan` over steps
reproduces the offline pipeline exactly (tested to 1e-5).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepxi_tpu.models.tcn import ResNetV2, cyclic_dilation
from deepxi_tpu.ops.gains import gfunc
from deepxi_tpu.ops.kernels.spectral import _analysis_matrix, _synthesis_matrix
from deepxi_tpu.sig.mix import normalise


def _ln(x, scale=None, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale
    return y


class StreamState(NamedTuple):
    """Per-stream state: conv delay lines + analysis/synthesis sample carry."""
    conv_bufs: Tuple[jnp.ndarray, ...]   # each [B, (k-1)*d, C_in]
    wav_tail: jnp.ndarray                # [B, N_d - N_s] last input samples
    ola_tail: jnp.ndarray                # [B, N_d - N_s] synthesis carry


class StreamingEnhancer:
    """Frame-by-frame enhancement with a causal ResNetV2 xi estimator.

    Args:
      inp_tgt: a fitted MagXi family instance (provides dims + xi map).
      net: the ResNetV2 module (must be causal).
      params: flax params of `net`.
      gtype: gain function.
    """

    def __init__(self, inp_tgt, net: ResNetV2, params, gtype: str = "mmse-lsa"):
        if not net.causal:
            raise ValueError("streaming requires a causal network")
        if net.unit_type != "ReLU->LN->W+b":
            raise ValueError("streaming supports the ReLU->LN->W+b unit order")
        if net.outp_act != "Sigmoid":
            raise ValueError("streaming implements the Sigmoid output head")
        if inp_tgt.N_d != 2 * inp_tgt.N_s:
            raise ValueError("streaming assumes 50% overlap (N_d == 2*N_s)")
        self.it = inp_tgt
        self.net = net
        self.p = params["params"]
        self.gtype = gtype
        self.N_d, self.N_s, self.K = inp_tgt.N_d, inp_tgt.N_s, inp_tgt.K
        self.nb = self.K // 2 + 1
        self.A = jnp.asarray(_analysis_matrix(self.N_d, self.K))
        self.S = jnp.asarray(_synthesis_matrix(self.N_d, self.N_s, self.K))
        # dilated-conv schedule: (block index, dilation)
        self.dilations = [cyclic_dilation(i, net.max_d_rate)
                          for i in range(net.n_blocks)]

    def init_state(self, batch: int) -> StreamState:
        bufs: List[jnp.ndarray] = []
        for i, d in enumerate(self.dilations):
            k = self.net.k
            bufs.append(jnp.zeros((batch, (k - 1) * d, self.net.d_f)))
        pad = self.N_d - self.N_s
        return StreamState(conv_bufs=tuple(bufs),
                           wav_tail=jnp.zeros((batch, pad)),
                           ola_tail=jnp.zeros((batch, pad)))

    def prime(self, state: StreamState, chunk: jnp.ndarray) -> StreamState:
        """Load the first hop into the analysis tail WITHOUT running the
        network. The first analysis frame spans samples [0, N_d) =
        [chunk_0, chunk_1], so processing must start at the second chunk;
        priming keeps the TCN delay lines exactly equal to the offline
        zero-padding (a half-zero warm-up frame would pollute them)."""
        x = normalise(chunk) if chunk.dtype != jnp.float32 else chunk
        return state._replace(wav_tail=x)

    # -- network single-frame step -------------------------------------------

    def _conv1x1(self, x, name):
        w = self.p[name]["kernel"][0]            # [Cin, Cout]
        return x @ w + self.p[name]["bias"]

    def _net_step(self, bufs, frame_feat):
        """One frame through the causal TCN. frame_feat: [B, n_feat]."""
        x = self._conv1x1(frame_feat, "ff_conv")
        x = _ln(x, self.p["ff_ln"]["scale"])
        x = jax.nn.relu(x)

        new_bufs = []
        k = self.net.k
        for i, d in enumerate(self.dilations):
            h = jax.nn.relu(x)
            h = _ln(h)
            h = self._conv1x1(h, f"block{i}_u1_conv")      # -> d_f

            h2 = jax.nn.relu(h)
            h2 = _ln(h2)
            buf = bufs[i]                                   # [B, (k-1)d, d_f]
            # dilated taps: positions t-(k-1)d ... t-d from the buffer, t = h2
            w = self.p[f"block{i}_u2_conv"]["kernel"]       # [k, d_f, d_f]
            y = h2 @ w[k - 1]
            for j in range(k - 1):
                # tap j uses the frame (k-1-j)*d steps in the past ==
                # buffer index j*d (buffer stores the last (k-1)*d inputs
                # of this conv, oldest first)
                y = y + buf[:, j * d] @ w[j]
            y = y + self.p[f"block{i}_u2_conv"]["bias"]
            # roll the buffer: drop oldest, append current input frame h2
            new_bufs.append(jnp.concatenate([buf[:, 1:], h2[:, None]], axis=1))

            h3 = jax.nn.relu(y)
            h3 = _ln(h3)
            h3 = self._conv1x1(h3, f"block{i}_u3_conv")     # -> d_model
            x = x + h3

        out = self._conv1x1(x, "out_conv")
        return tuple(new_bufs), jax.nn.sigmoid(out)

    # -- full streaming step --------------------------------------------------

    def step(self, state: StreamState, chunk: jnp.ndarray
             ) -> Tuple[StreamState, jnp.ndarray]:
        """Process one hop of audio.

        Args:
          state: stream state.
          chunk: [B, N_s] int16 (or float) samples.
        Returns:
          (new_state, [B, N_s] float32 enhanced samples). The output hop
          lags the input by N_d - N_s samples (analysis latency).
        """
        x = normalise(chunk) if chunk.dtype != jnp.float32 else chunk
        frame = jnp.concatenate([state.wav_tail, x], axis=1)  # [B, N_d]
        wav_tail = frame[:, self.N_s:]

        Y = frame @ self.A                                    # [B, 2*nb]
        re, im = Y[:, :self.nb], Y[:, self.nb:]
        mag = jnp.sqrt(re * re + im * im)

        bufs, xi_bar = self._net_step(state.conv_bufs, mag)
        xi_hat = self.it.xi_map.inverse(xi_bar)
        G = gfunc(xi_hat, xi_hat + 1.0, self.gtype)
        Yg = jnp.concatenate([re * G, im * G], axis=1)
        syn = Yg @ self.S                                     # [B, N_d]

        out = syn[:, :self.N_s] + state.ola_tail[:, :self.N_s]
        pad = self.N_d - self.N_s
        carry = jnp.concatenate(
            [state.ola_tail[:, self.N_s:],
             jnp.zeros((x.shape[0], min(self.N_s, pad)))], axis=1) + syn[:, self.N_s:]
        new_state = StreamState(conv_bufs=bufs, wav_tail=wav_tail,
                                ola_tail=carry)
        return new_state, out

    def stream(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Run a whole waveform [B, T*N_s] through the streaming step via
        `lax.scan`. Bit-equal (1e-5) to the offline fused pipeline: prime
        with chunk 0, process chunks 1..T-1 plus one zero chunk (the
        offline pad_end frame), emitting exactly the offline output."""
        B, n = wav.shape
        T = n // self.N_s
        chunks = wav[:, :T * self.N_s].reshape(B, T, self.N_s)
        state = self.prime(self.init_state(B), chunks[:, 0])
        rest = jnp.concatenate(
            [normalise(chunks[:, 1:]) if chunks.dtype != jnp.float32
             else chunks[:, 1:],
             jnp.zeros((B, 1, self.N_s))], axis=1).transpose(1, 0, 2)

        def body(st, ch):
            return self.step(st, ch)

        _, outs = jax.lax.scan(body, state, rest)
        return outs.transpose(1, 0, 2).reshape(B, T * self.N_s)
