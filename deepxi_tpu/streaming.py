"""Streaming (frame-by-frame) causal enhancement.

The reference is strictly offline (whole-utterance `model.predict`,
ref: deepxi/model.py:286); its causal models (resnet-*c, mhanet-*c) are
nevertheless streamable in principle. This module implements real streaming
for BOTH causal families:

  * `StreamingEnhancer` -- ResNet TCN: per-frame step with explicit
    delay-line state for every dilated convolution;
  * `StreamingMHANet` -- MHANetV2/V3: per-frame step with per-block K/V
    caches (causal self-attention re-reads its whole past, so the state is
    the projected history up to `max_len` frames -- the same cap the
    offline model's learned positional embedding imposes).

Both share streaming STFT analysis and overlap-add synthesis.

Latency: one analysis window (N_d = 32 ms) + one hop (N_s = 16 ms) of
algorithmic delay; each `step` consumes one N_s-sample hop and emits one
N_s-sample hop of enhanced audio.

Everything is static-shaped and jittable, so a compiled `step` can serve
real-time audio; `lax.scan` over steps reproduces the offline pipeline
exactly (tested to 1e-5, tests/test_streaming.py)."""

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


class MHAStreamState(NamedTuple):
    """Per-stream MHANet state: per-block K/V caches + frame clock +
    analysis/synthesis sample carry."""
    k_caches: Tuple[jnp.ndarray, ...]   # each [B, max_len, H, dk]
    v_caches: Tuple[jnp.ndarray, ...]
    t: jnp.ndarray                      # [] int32 current frame index
    wav_tail: jnp.ndarray               # [B, N_d - N_s]
    ola_tail: jnp.ndarray               # [B, N_d - N_s]


class StreamingMHANet:
    """Frame-by-frame enhancement with a causal MHANetV2/V3 xi estimator.

    Causal self-attention attends over its WHOLE past, so streaming keeps a
    K/V cache per block (the projected history), appended one frame per
    hop; the additive -1e10 masking of the tfa convention
    (ref: deepxi/network/attention.py:355-385) zeroes the unwritten cache
    tail exactly, so outputs match the offline path to float rounding while
    t < max_len (the offline model's own positional-embedding cap,
    2048 frames = ~33 s; beyond it both paths wrap the embedding but the
    cache evicts nothing -- streaming is defined for utterances within the
    cap, like the reference's offline model)."""

    def __init__(self, inp_tgt, net, params, gtype: str = "mmse-lsa",
                 fused: bool = False, cache_dtype=jnp.float32):
        """fused=True routes the per-hop cache attention through the
        single-launch Pallas kernel (ops/kernels/mha_cache.py);
        cache_dtype=jnp.bfloat16 halves the cache HBM traffic that sets
        streaming capacity (logits/softmax stay float32 either way)."""
        name = type(net).__name__
        if name not in ("MHANetV2", "MHANetV3"):
            raise ValueError(f"StreamingMHANet supports MHANetV2/V3, got {name}")
        if not net.causal:
            raise ValueError("streaming requires a causal network")
        if inp_tgt.N_d != 2 * inp_tgt.N_s:
            raise ValueError("streaming assumes 50% overlap (N_d == 2*N_s)")
        self.it = inp_tgt
        self.net = net
        self.p = params["params"]
        self.gtype = gtype
        self.fused = fused
        self.cache_dtype = cache_dtype
        self.N_d, self.N_s, self.K = inp_tgt.N_d, inp_tgt.N_s, inp_tgt.K
        self.nb = self.K // 2 + 1
        self.A = jnp.asarray(_analysis_matrix(self.N_d, self.K))
        self.S = jnp.asarray(_synthesis_matrix(self.N_d, self.N_s, self.K))
        self.H = net.n_heads
        self.dk = net.d_model // net.n_heads
        self.max_len = getattr(net, "max_len", 2048)
        self.has_pos = name == "MHANetV3"

    def init_state(self, batch: int) -> MHAStreamState:
        kc = tuple(jnp.zeros((batch, self.max_len, self.H, self.dk),
                             self.cache_dtype)
                   for _ in range(self.net.n_blocks))
        vc = tuple(jnp.zeros((batch, self.max_len, self.H, self.dk),
                             self.cache_dtype)
                   for _ in range(self.net.n_blocks))
        pad = self.N_d - self.N_s
        return MHAStreamState(k_caches=kc, v_caches=vc,
                              t=jnp.zeros((), jnp.int32),
                              wav_tail=jnp.zeros((batch, pad)),
                              ola_tail=jnp.zeros((batch, pad)))

    def prime(self, state: MHAStreamState, chunk: jnp.ndarray) -> MHAStreamState:
        """Load the first hop into the analysis tail WITHOUT running the
        network (same contract as StreamingEnhancer.prime)."""
        x = normalise(chunk) if chunk.dtype != jnp.float32 else chunk
        return state._replace(wav_tail=x)

    def _layer_norm(self, x, name):
        ln = self.p[name]
        return _ln(x, ln["scale"]) + ln["bias"]

    def _net_step(self, state: MHAStreamState, feat):
        """One frame through the MHANet. feat: [B, n_feat]."""
        p = self.p
        t = state.t
        x = feat @ p["in_conv"]["kernel"][0]        # no bias (tfa-style)
        x = self._layer_norm(x, "in_ln")
        x = jax.nn.relu(x)
        if self.has_pos:
            x = x + jnp.take(p["pos_emb"]["embedding"],
                             t % self.max_len, axis=0)

        valid = (jnp.arange(self.max_len) <= t).astype(jnp.float32)
        new_kc, new_vc = [], []
        for i in range(self.net.n_blocks):
            mha = p[f"block{i}_mha"]
            q = jnp.einsum("bI,HId->bHd", x, mha["query_kernel"]) \
                * (float(self.dk) ** -0.5)
            k_new = jnp.einsum("bI,HId->bHd", x, mha["key_kernel"])
            v_new = jnp.einsum("bI,HId->bHd", x, mha["value_kernel"])
            kc = jax.lax.dynamic_update_slice(
                state.k_caches[i], k_new[:, None].astype(self.cache_dtype),
                (0, t, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                state.v_caches[i], v_new[:, None].astype(self.cache_dtype),
                (0, t, 0, 0))
            new_kc.append(kc)
            new_vc.append(vc)
            if self.fused:
                from deepxi_tpu.ops.kernels.mha_cache import mha_cache_step
                o = mha_cache_step(q, kc, vc, valid)
            else:
                logits = jnp.einsum("bHd,bLHd->bHL", q,
                                    kc.astype(jnp.float32))
                logits = logits + (-1.0e10) * (1.0 - valid)[None, None, :]
                w = jax.nn.softmax(logits, axis=-1)
                o = jnp.einsum("bHL,bLHd->bHd", w, vc.astype(jnp.float32))
            h = jnp.einsum("bHd,Hdo->bo", o, mha["projection_kernel"])
            x = self._layer_norm(x + h, f"block{i}_ln1")
            h = jax.nn.relu(x @ p[f"block{i}_ff1"]["kernel"]
                            + p[f"block{i}_ff1"]["bias"])
            h = h @ p[f"block{i}_ff2"]["kernel"] + p[f"block{i}_ff2"]["bias"]
            x = self._layer_norm(x + h, f"block{i}_ln2")

        out = x @ p["out_conv"]["kernel"][0] + p["out_conv"]["bias"]
        return tuple(new_kc), tuple(new_vc), jax.nn.sigmoid(out)

    def _net_step_block(self, state: MHAStreamState, feat):
        """``H`` frames through the MHANet in one dispatch. feat: [B, H, F].

        Identical math to ``H`` sequential `_net_step` calls (the network is
        feed-forward over frames; causality lives only in the attention
        mask), but each block's cache is READ ONCE for all ``H`` queries —
        logits are one [H, L] matmul instead of ``H`` [1, L] matvecs — so
        per-hop HBM cache traffic drops ``H``-fold and the MXU sees real
        tiles. This is the hop-batched ("chunked") serving mode: ``H×16 ms``
        added latency buys ~``H×`` stream capacity (bench.py's
        ``streaming_mha_channels_per_chip_chunked``)."""
        p = self.p
        t = state.t
        Hn = feat.shape[1]
        x = jnp.einsum("btI,Io->bto", feat, p["in_conv"]["kernel"][0])
        x = self._layer_norm(x, "in_ln")
        x = jax.nn.relu(x)
        if self.has_pos:
            x = x + jnp.take(p["pos_emb"]["embedding"],
                             (t + jnp.arange(Hn)) % self.max_len, axis=0)

        # query i (absolute position t+i) sees cache entries j <= t+i
        valid = (jnp.arange(self.max_len)[None, :]
                 <= (t + jnp.arange(Hn))[:, None]).astype(jnp.float32)
        new_kc, new_vc = [], []
        for i in range(self.net.n_blocks):
            mha = p[f"block{i}_mha"]
            q = jnp.einsum("btI,HId->btHd", x, mha["query_kernel"]) \
                * (float(self.dk) ** -0.5)
            k_new = jnp.einsum("btI,HId->btHd", x, mha["key_kernel"])
            v_new = jnp.einsum("btI,HId->btHd", x, mha["value_kernel"])
            kc = jax.lax.dynamic_update_slice(
                state.k_caches[i], k_new.astype(self.cache_dtype),
                (0, t, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                state.v_caches[i], v_new.astype(self.cache_dtype),
                (0, t, 0, 0))
            new_kc.append(kc)
            new_vc.append(vc)
            logits = jnp.einsum("btHd,bLHd->bHtL", q,
                                kc.astype(jnp.float32))
            logits = logits + (-1.0e10) * (1.0 - valid)[None, None]
            w = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bHtL,bLHd->btHd", w, vc.astype(jnp.float32))
            h = jnp.einsum("btHd,Hdo->bto", o, mha["projection_kernel"])
            x = self._layer_norm(x + h, f"block{i}_ln1")
            h = jax.nn.relu(jnp.einsum("bto,oi->bti", x,
                                       p[f"block{i}_ff1"]["kernel"])
                            + p[f"block{i}_ff1"]["bias"])
            h = jnp.einsum("bti,io->bto", h, p[f"block{i}_ff2"]["kernel"]) \
                + p[f"block{i}_ff2"]["bias"]
            x = self._layer_norm(x + h, f"block{i}_ln2")

        out = jnp.einsum("bto,oK->btK", x, p["out_conv"]["kernel"][0]) \
            + p["out_conv"]["bias"]
        return tuple(new_kc), tuple(new_vc), jax.nn.sigmoid(out)

    def step_block(self, state: MHAStreamState, chunk: jnp.ndarray
                   ) -> Tuple[MHAStreamState, jnp.ndarray]:
        """Process ``H`` hops of audio in one dispatch (chunked streaming).

        chunk: [B, H*N_s] samples; returns [B, H*N_s] enhanced samples.
        Output equals ``H`` sequential `step` calls to float rounding
        (tests/test_streaming_mha.py); latency grows to ``H`` hops."""
        x = normalise(chunk) if chunk.dtype != jnp.float32 else chunk
        B = x.shape[0]
        Hn = x.shape[1] // self.N_s
        full = jnp.concatenate([state.wav_tail, x], axis=1)
        wav_tail = full[:, Hn * self.N_s:]
        # 50% overlap framing: frame i = full[i*N_s : i*N_s + N_d]
        frames = jnp.stack(
            [full[:, i * self.N_s: i * self.N_s + self.N_d]
             for i in range(Hn)], axis=1)                     # [B, H, N_d]

        Y = jnp.einsum("btn,nK->btK", frames, self.A)
        re, im = Y[..., :self.nb], Y[..., self.nb:]
        mag = jnp.sqrt(re * re + im * im)

        kc, vc, xi_bar = self._net_step_block(state, mag)
        xi_hat = self.it.xi_map.inverse(xi_bar)
        G = gfunc(xi_hat, xi_hat + 1.0, self.gtype)
        Yg = jnp.concatenate([re * G, im * G], axis=-1)
        syn = jnp.einsum("btK,Kn->btn", Yg, self.S)           # [B, H, N_d]

        # overlap-add across the block (N_d == 2*N_s): hop i's output is
        # its first half plus the previous frame's second half.
        heads = syn[..., :self.N_s]                           # [B, H, N_s]
        tails = syn[..., self.N_s:]                           # [B, H, N_s]
        prev = jnp.concatenate([state.ola_tail[:, None, :self.N_s],
                                tails[:, :-1]], axis=1)
        out = (heads + prev).reshape(B, Hn * self.N_s)
        new_state = MHAStreamState(k_caches=kc, v_caches=vc, t=state.t + Hn,
                                   wav_tail=wav_tail, ola_tail=tails[:, -1])
        return new_state, out

    def step(self, state: MHAStreamState, chunk: jnp.ndarray
             ) -> Tuple[MHAStreamState, jnp.ndarray]:
        """Process one hop of audio: same wav contract as
        StreamingEnhancer.step."""
        x = normalise(chunk) if chunk.dtype != jnp.float32 else chunk
        frame = jnp.concatenate([state.wav_tail, x], axis=1)
        wav_tail = frame[:, self.N_s:]

        Y = frame @ self.A
        re, im = Y[:, :self.nb], Y[:, self.nb:]
        mag = jnp.sqrt(re * re + im * im)

        kc, vc, xi_bar = self._net_step(state, mag)
        xi_hat = self.it.xi_map.inverse(xi_bar)
        G = gfunc(xi_hat, xi_hat + 1.0, self.gtype)
        Yg = jnp.concatenate([re * G, im * G], axis=1)
        syn = Yg @ self.S

        out = syn[:, :self.N_s] + state.ola_tail[:, :self.N_s]
        pad = self.N_d - self.N_s
        carry = jnp.concatenate(
            [state.ola_tail[:, self.N_s:],
             jnp.zeros((x.shape[0], min(self.N_s, pad)))], axis=1) \
            + syn[:, self.N_s:]
        new_state = MHAStreamState(k_caches=kc, v_caches=vc, t=state.t + 1,
                                   wav_tail=wav_tail, ola_tail=carry)
        return new_state, out

    def stream(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Whole waveform via lax.scan over steps (parity harness)."""
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
