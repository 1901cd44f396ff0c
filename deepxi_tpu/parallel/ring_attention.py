"""Ring-sharded attention: MHANet enhancement with the TIME axis sharded
over the device mesh (SURVEY.md section 2f item d; round-3 VERDICT next #6).

`parallel/seq_enhance.py` covers the TCN family, whose finite causal
receptive field makes a one-`ppermute` halo exact. Attention has no
finite halo -- every frame attends over its whole past -- so the TPU-native
answer is RING attention: each device keeps its local query shard and its
(m, l, acc) online-softmax state while the K/V chunks rotate around the
mesh's data axis with one `ppermute` per step; after n_devices steps every
query has seen every key exactly once. The recurrence is the same
rescaled-accumulator algebra as the single-chip streaming kernel
(ops/kernels/mha_flash_stream.py), so results match the full path to
float rounding on valid frames.

No reference equivalent: golfbears/DeepXi has no multi-device machinery at
all, and its own MHANet caps sequences at 2048 frames
(ref: deepxi/network/attention.py:431-433). This module is the
beyond-reference long-recording path: hour-scale audio at 1/N wall-clock.

Mask/convention notes (identical to the flax module):
  * tfa additive masking, ``logits += -1e10 * (1 - mask)`` -- every logit
    stays finite, so the online rescaling is exact and fully-masked rows
    degrade to softmax(raw logits), discarded downstream.
  * frame validity is Keras Masking(0.0) semantics computed from the
    LOCAL shard's network input -- identical values to the offline path
    because the shard's frames are identical.
  * causal masking compares GLOBAL frame positions (shard offset + local
    index); for causal runs the above-diagonal ring steps are fully
    masked compute (~2x overhead vs a perfect triangle), the standard
    ring-attention trade for a uniform collective schedule.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepxi_tpu.parallel.mesh import DATA_AXIS

NEG_INF_V2 = -1.0e10  # tfa's masking constant


def ring_attention(qp, kp, vp, valid, q_pos0, axis_name: str, n_sh: int,
                   causal: bool, t_total: int, block_q: int = 512):
    """Online-softmax attention over K/V chunks rotating around the ring.

    Call INSIDE shard_map. Shapes (per device):
      qp/kp/vp: [B, Ts, H, d] local projected heads (q pre-scaled).
      valid: [B, Ts] float 1/0 frame validity of the local shard.
      q_pos0: scalar global frame index of this shard's first frame.
    Returns [B, Ts, H, d].
    """
    B, Ts, H, d = qp.shape
    bq = min(block_q, Ts)
    # pad q rows to a tile multiple; padded rows are masked invalid
    Tq = -(-Ts // bq) * bq
    nq = Tq // bq
    qpad = jnp.pad(qp, ((0, 0), (0, Tq - Ts), (0, 0), (0, 0)))
    vq = jnp.pad(valid, ((0, 0), (0, Tq - Ts)))
    q_pos = q_pos0 + jnp.arange(Tq)

    # per-q-row online state
    m = jnp.full((B, H, Tq), -1e30, jnp.float32)
    l = jnp.zeros((B, H, Tq), jnp.float32)
    acc = jnp.zeros((B, H, Tq, d), jnp.float32)

    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_sh) for i in range(n_sh)]

    kc, vc, vkc = kp, vp, valid
    for r in range(n_sh):
        # chunk currently held came from shard (idx - r) mod n_sh
        src = jnp.mod(idx - r, n_sh)
        k_pos = src * Ts + jnp.arange(Ts)

        def tile(args, kc=kc, vc=vc, vkc=vkc, k_pos=k_pos):
            qt, vqt, qpt, mt, lt, at = args
            logits = jnp.einsum("btHd,bsHd->bHts", qt, kc,
                                preferred_element_type=jnp.float32)
            mask = vqt[:, :, None] * vkc[:, None, :]          # [B, bq, Ts]
            if causal:
                mask = mask * (k_pos[None, None, :]
                               <= qpt[None, :, None]).astype(jnp.float32)
            logits = logits + NEG_INF_V2 * (1.0 - mask[:, None])
            m_new = jnp.maximum(mt, jnp.max(logits, axis=-1))
            alpha = jnp.exp(mt - m_new)
            p = jnp.exp(logits - m_new[..., None])
            l_new = lt * alpha + jnp.sum(p, axis=-1)
            a_new = (at * alpha[..., None]
                     + jnp.einsum("bHts,bsHd->bHtd", p, vc,
                                  preferred_element_type=jnp.float32))
            return m_new, l_new, a_new

        # sequential q tiles bound the live logits at [B, H, bq, Ts]
        qt = qpad.reshape(B, nq, bq, H, d).transpose(1, 0, 2, 3, 4)
        vqt = vq.reshape(B, nq, bq).transpose(1, 0, 2)
        qpt = q_pos.reshape(nq, bq)
        mt = m.reshape(B, H, nq, bq).transpose(2, 0, 1, 3)
        lt = l.reshape(B, H, nq, bq).transpose(2, 0, 1, 3)
        at = acc.reshape(B, H, nq, bq, d).transpose(2, 0, 1, 3, 4)
        mo, lo, ao = jax.lax.map(tile, (qt, vqt, qpt, mt, lt, at))
        m = mo.transpose(1, 2, 0, 3).reshape(B, H, Tq)
        l = lo.transpose(1, 2, 0, 3).reshape(B, H, Tq)
        acc = ao.transpose(1, 2, 0, 3, 4).reshape(B, H, Tq, d)

        if r != n_sh - 1:  # rotate K/V/validity one step around the ring
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            vkc = jax.lax.ppermute(vkc, axis_name, perm)

    out = (acc / l[..., None]).transpose(0, 2, 1, 3)   # [B, Tq, H, d]
    return out[:, :Ts]


def _ln(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def mhanet_ring_apply(params, mag, q_pos0, axis_name: str, n_sh: int,
                      n_blocks: int = 5, n_heads: int = 8,
                      d_model: int = 256, max_len: int = 2048,
                      causal: bool = True, positional: bool = True,
                      outp_act: str = "Sigmoid",
                      block_q: int = 512) -> jnp.ndarray:
    """MHANetV3 (V2 with positional=False) forward on a TIME SHARD of the
    input, ring attention replacing the local attention. Everything else
    (in_conv, LNs, FFNs, positional embedding at GLOBAL positions mod
    max_len, out_conv) is frame-pointwise and runs locally. Flax param
    layouts (models/attention.py); call inside shard_map."""
    from deepxi_tpu.models.tcn import output_activation

    p = params["params"]
    B, Ts, F = mag.shape
    valid = jnp.any(mag != 0.0, axis=-1).astype(jnp.float32)

    h = jnp.dot(mag, p["in_conv"]["kernel"][0],
                preferred_element_type=jnp.float32)
    h = _ln(h, p["in_ln"]["scale"], p["in_ln"]["bias"])
    h = jax.nn.relu(h)
    if positional:
        pos = jnp.mod(q_pos0 + jnp.arange(Ts), max_len)
        h = h + p["pos_emb"]["embedding"][pos][None]

    dk = d_model // n_heads
    scale = float(dk) ** -0.5
    for i in range(n_blocks):
        blk = p[f"block{i}_mha"]
        qp = jnp.einsum("btI,HId->btHd", h, blk["query_kernel"]) * scale
        kp = jnp.einsum("bsI,HId->bsHd", h, blk["key_kernel"])
        vp = jnp.einsum("bsI,HId->bsHd", h, blk["value_kernel"])
        att = ring_attention(qp, kp, vp, valid, q_pos0, axis_name, n_sh,
                             causal, t_total=n_sh * Ts, block_q=block_q)
        att = jnp.einsum("btHd,Hdo->bto", att, blk["projection_kernel"])
        h = _ln(h + att, p[f"block{i}_ln1"]["scale"],
                p[f"block{i}_ln1"]["bias"])
        f = jax.nn.relu(jnp.dot(h, p[f"block{i}_ff1"]["kernel"])
                        + p[f"block{i}_ff1"]["bias"])
        f = jnp.dot(f, p[f"block{i}_ff2"]["kernel"]) + p[f"block{i}_ff2"]["bias"]
        h = _ln(h + f, p[f"block{i}_ln2"]["scale"], p[f"block{i}_ln2"]["bias"])

    out = jnp.dot(h, p["out_conv"]["kernel"][0]) + p["out_conv"]["bias"]
    return output_activation(out, outp_act)


def make_ring_mha_enhancer(inp_tgt, mesh: Optional[Mesh] = None,
                           gtype: str = "mmse-lsa", n_blocks: int = 5,
                           n_heads: int = 8, d_model: int = 256,
                           max_len: int = 2048, causal: bool = True,
                           positional: bool = True,
                           outp_act: str = "Sigmoid",
                           precision: str = "default",
                           block_q: int = 512):
    """Build `enhance(params, x_int16[n]) -> y_float[n]`: ONE long
    recording enhanced by the MHANet flagship with time sharded over the
    mesh's data axis. MagXi gain-form synthesis (the flagship family).

    Exactness: the shard's frames are the global pipeline's frames (the
    one-frame STFT overhang comes from the right neighbour over ICI, like
    seq_enhance), ring attention sees every (query, key) pair once with
    global-position causal masking, and the frame-linear synthesis
    (tf.signal inverse_stft_window_fn semantics) makes the cross-boundary
    overlap-add an exact one-`ppermute` tail exchange. Matches the
    offline `make_enhancer` output to float rounding
    (tests/test_ring_attention.py).
    """
    from deepxi_tpu.ops.gains import gfunc
    from deepxi_tpu.ops.kernels.spectral import (
        _analysis_matrix, _synthesis_matrix)
    from deepxi_tpu.sig.stft import frame
    from deepxi_tpu.sig.mix import normalise
    from jax import shard_map

    if mesh is None:
        raise ValueError("a mesh is required")
    N_d, N_s, K = inp_tgt.N_d, inp_tgt.N_s, inp_tgt.K
    nb = K // 2 + 1
    n_sh = mesh.shape[DATA_AXIS]
    right = N_d - N_s  # one frame's overhang
    prec = jax.lax.Precision.HIGHEST if precision == "highest" \
        else jax.lax.Precision.DEFAULT

    def shard_body(params, x_sh):
        """x_sh: [1, L] int16 time shard."""
        L = x_sh.shape[1]
        Ts = L // N_s
        idx = jax.lax.axis_index(DATA_AXIS)
        # STFT overhang: first `right` samples of the next shard (zeros on
        # the last device == the global pipeline's pad_end zeros)
        right_h = jax.lax.ppermute(x_sh[:, :right], DATA_AXIS,
                                   [(i + 1, i) for i in range(n_sh - 1)])
        xw = normalise(jnp.concatenate([x_sh, right_h], axis=1))
        fr = frame(xw, N_d, N_s, pad_end=False)            # [1, Ts, N_d]
        Y = jnp.dot(fr, jnp.asarray(_analysis_matrix(N_d, K)),
                    precision=prec)
        re, im = Y[..., :nb], Y[..., nb:]
        mag = jnp.sqrt(re * re + im * im)
        tgt = mhanet_ring_apply(params, mag, idx * Ts, DATA_AXIS, n_sh,
                                n_blocks=n_blocks, n_heads=n_heads,
                                d_model=d_model, max_len=max_len,
                                causal=causal, positional=positional,
                                outp_act=outp_act, block_q=block_q)
        xi_hat = inp_tgt.xi_map.inverse(tgt)
        G = gfunc(xi_hat, xi_hat + 1.0, gtype)
        Yg = jnp.concatenate([re * G, im * G], axis=-1)
        frames = jnp.dot(Yg, jnp.asarray(_synthesis_matrix(N_d, N_s, K)),
                         precision=prec)                   # [1, Ts, N_d]
        # frame-linear overlap-add: local output is L + right samples;
        # the tail lands in the next shard's head
        h1 = frames[..., :N_s].reshape(1, L)
        h2 = frames[..., N_s:].reshape(1, L)               # shifted +N_s
        y = h1 + jnp.concatenate([jnp.zeros((1, N_s)), h2[:, :-N_s]], 1)
        tail = h2[:, -N_s:]                                # samples [L, L+N_s)
        tail_in = jax.lax.ppermute(tail, DATA_AXIS,
                                   [(i, i + 1) for i in range(n_sh - 1)])
        return y.at[:, :N_s].add(tail_in)

    @jax.jit
    def enhance(params, x):
        n = x.shape[-1]
        chunk = n_sh * N_s
        n_pad = -(-n // chunk) * chunk
        if n_pad != n:
            x = jnp.pad(x, (0, n_pad - n))
        xs = jax.lax.with_sharding_constraint(
            x.reshape(1, n_pad), NamedSharding(mesh, P(None, DATA_AXIS)))
        y = shard_map(shard_body, mesh=mesh,
                      in_specs=(P(), P(None, DATA_AXIS)),
                      out_specs=P(None, DATA_AXIS))(params, xs)
        return y[0, :n]

    return enhance
