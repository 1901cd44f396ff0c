"""Multi-head attention networks (ref: deepxi/network/attention.py).

Three generations, matching the reference's semantics exactly:

  * ``MHANet``   -- custom MHA with 1x1-conv QKVO projections, additive -1e9
    attention mask then softmax then *multiplicative* sequence mask
    (ref: deepxi/network/attention.py:15-207).
  * ``MHANetV2`` -- tfa.layers.MultiHeadAttention-style einsum projections
    (no projection bias) with the ``logits += -1e10 * (1 - mask)`` masking
    convention (ref: deepxi/network/attention.py:278-385).
  * ``MHANetV3`` -- V2 plus a learned BERT-style positional embedding added
    after the in-projection, capped at ``max_len`` frames
    (ref: deepxi/network/attention.py:387-442). mhanet-1.1c: d_model 256,
    5 blocks, 8 heads, max_len 2048 => 4,600,321 params
    (ref: log/summary/mhanet-1.1c.txt).

Masks derive from the padded input exactly like Keras ``Masking(0.0)``: a
frame is valid iff any feature is non-zero (ref: deepxi/network/attention.py:237).
Attention is computed with full [B, h, T, T] logits -- fine on TPU for speech
lengths; long-context inference uses the blockwise path in
``deepxi_tpu.ops.kernels`` (see parallel layer).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepxi_tpu.models.tcn import conv1d, output_activation

NEG_INF_V1 = -1.0e9   # (ref: deepxi/network/attention.py:49)
NEG_INF_V2 = -1.0e10  # tfa's -10e9 masking constant


def sequence_valid_mask(x: jnp.ndarray) -> jnp.ndarray:
    """Keras Masking(0.0) semantics: frame valid iff any feature != 0.

    Args:
      x: [B, T, F] network input.
    Returns:
      [B, T] bool.
    """
    return jnp.any(x != 0.0, axis=-1)


def attention_masks(x: jnp.ndarray, causal: bool):
    """(additive_mask [B,T,T] float, seq_mask [B,T,T] float) as in the
    reference's AttentionMask layer (ref: deepxi/network/attention.py:209-276)."""
    valid = sequence_valid_mask(x)
    seq2d = valid[:, None, :] & valid[:, :, None]
    logical = seq2d
    if causal:
        T = x.shape[1]
        tril = jnp.tril(jnp.ones((T, T), bool))
        logical = logical & tril[None]
    att_mask = jnp.where(logical, 0.0, NEG_INF_V1).astype(jnp.float32)
    return att_mask, seq2d.astype(jnp.float32)


def attention_mask_v2(x: jnp.ndarray, causal: bool) -> jnp.ndarray:
    """Float 1/0 mask [B,1,T,T] for the tfa convention
    (ref: deepxi/network/attention.py:355-385)."""
    valid = sequence_valid_mask(x)
    logical = valid[:, None, :] & valid[:, :, None]
    if causal:
        T = x.shape[1]
        logical = logical & jnp.tril(jnp.ones((T, T), bool))[None]
    return logical.astype(jnp.float32)[:, None]


def _blockwise_attention(qp: jnp.ndarray, kp: jnp.ndarray, vp: jnp.ndarray,
                         valid: jnp.ndarray, causal: bool,
                         block_q: int) -> jnp.ndarray:
    """Query-blocked attention: scan over query blocks so only
    [B, H, block_q, T] logits are live at once; mask rows are rebuilt per
    block from the [B, T] valid vector (never materialising [T, T]). Same
    additive-mask softmax as the full path -> outputs match to float
    rounding, with O(T * block_q) live memory.

    qp/kp/vp: [B, T, H, d]; valid: [B, T] bool.
    """
    B, T, H, d = qp.shape
    Tpad = -(-T // block_q) * block_q
    if Tpad != T:
        qp = jnp.pad(qp, ((0, 0), (0, Tpad - T), (0, 0), (0, 0)))
    nblk = Tpad // block_q
    q_blocks = qp.reshape(B, nblk, block_q, H, d).transpose(1, 0, 2, 3, 4)
    key_pos = jnp.arange(T)

    def body(_, x):
        qb, blk = x
        logits = jnp.einsum("btHd,bsHd->bHts", qb, kp)
        q_pos = blk * block_q + jnp.arange(block_q)
        q_valid = jnp.take(valid, jnp.minimum(q_pos, T - 1), axis=1)
        mb = valid[:, None, :] & q_valid[:, :, None]       # [B, bq, T]
        if causal:
            mb = mb & (key_pos[None, None, :] <= q_pos[None, :, None])
        logits = logits + NEG_INF_V2 * (1.0 - mb[:, None].astype(logits.dtype))
        w = jax.nn.softmax(logits, axis=-1)
        return None, jnp.einsum("bHts,bsHd->btHd", w, vp)

    _, outs = jax.lax.scan(body, None, (q_blocks, jnp.arange(nblk)))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(B, Tpad, H, d)
    return out[:, :T]


class MultiHeadAttentionV1(nn.Module):
    """Custom MHA with 1x1-conv (i.e. dense, no bias) QKVO projections
    (ref: deepxi/network/attention.py:103-207)."""
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, q, v, k, att_mask, seq_mask):
        B, T = q.shape[0], q.shape[1]
        d_k = self.d_model // self.n_heads

        def proj(h, name):
            return nn.Dense(self.d_model, use_bias=False, name=name)(h)

        def split_heads(h):
            return h.reshape(B, T, self.n_heads, d_k).transpose(0, 2, 1, 3)

        qh = split_heads(proj(q, "linear_q"))
        vh = split_heads(proj(v, "linear_v"))
        kh = split_heads(proj(k, "linear_k"))

        logits = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / jnp.sqrt(float(d_k))
        logits = logits + att_mask[:, None]
        w = nn.softmax(logits, axis=-1)
        # Post-softmax multiplicative sequence mask -- the reference's
        # idiosyncratic order (ref: deepxi/network/attention.py:204-205).
        w = w * seq_mask[:, None]
        out = jnp.einsum("bhts,bhsd->bhtd", w, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.d_model)
        return nn.Dense(self.d_model, use_bias=False, name="linear_o")(out)


class TFAMultiHeadAttention(nn.Module):
    """tfa.layers.MultiHeadAttention equivalent: einsum projections with
    kernels of shape [heads, in, head_size] (query/key/value) and
    [heads, head_size, out] (output), no projection bias, query scaled by
    head_size^-0.5, mask applied as logits += -1e10 (1 - mask). Weight layout
    matches tfa so reference checkpoints import transparently
    (verified against model/mhanet-1.1c/epoch-199 variable shapes)."""
    head_size: int
    num_heads: int
    output_size: int
    # "full": [B,H,T,T] logits (exact reference memory behaviour).
    # "block": lax.scan over query blocks -- O(T * block_q) live memory
    #   instead of O(T^2), for long-audio inference (SURVEY.md section 2f);
    #   numerically identical (same additive mask + softmax).
    # "fused": Pallas kernel keeping each query tile's logits in VMEM --
    #   the [T, T] score matrix never reaches HBM (the MHANet inference
    #   bottleneck); same additive-mask softmax, matches "full" on valid
    #   rows to float rounding (deepxi_tpu/ops/kernels/mha_fused.py).
    #   Holds whole K/V panels in VMEM, so T caps at a few thousand frames.
    # "stream": online-softmax Pallas kernel walking key tiles with a
    #   running (max, denom, acc) in VMEM scratch -- O(block_q * block_k)
    #   live memory at ANY T; the long-audio inference path
    #   (deepxi_tpu/ops/kernels/mha_flash_stream.py).
    impl: str = "full"
    block_q: int = 256

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None,
                 valid: Optional[jnp.ndarray] = None, causal: bool = False):
        I = q.shape[-1]

        def pkernel(name, shape):
            return self.param(name, nn.initializers.xavier_uniform(), shape)

        qk = pkernel("query_kernel", (self.num_heads, I, self.head_size))
        kk = pkernel("key_kernel", (self.num_heads, k.shape[-1], self.head_size))
        vk = pkernel("value_kernel", (self.num_heads, v.shape[-1], self.head_size))
        ok = pkernel("projection_kernel", (self.num_heads, self.head_size, self.output_size))

        qp = jnp.einsum("btI,HId->btHd", q, qk) * (float(self.head_size) ** -0.5)
        kp = jnp.einsum("bsI,HId->bsHd", k, kk)
        vp = jnp.einsum("bsI,HId->bsHd", v, vk)

        if self.impl in ("block", "fused", "stream"):
            if valid is None:
                raise ValueError(
                    f"{self.impl} attention needs the [B, T] valid mask")
            if self.impl == "stream":
                from deepxi_tpu.ops.kernels.mha_flash_stream import \
                    flash_attention_streaming
                out = flash_attention_streaming(qp, kp, vp, valid, causal,
                                                self.block_q)
            elif self.impl == "fused":
                from deepxi_tpu.ops.kernels.mha_fused import flash_attention
                out = flash_attention(qp, kp, vp, valid, causal, self.block_q)
            else:
                out = _blockwise_attention(qp, kp, vp, valid, causal,
                                           self.block_q)
        else:
            logits = jnp.einsum("btHd,bsHd->bHts", qp, kp)
            if mask is not None:
                logits = logits + NEG_INF_V2 * (1.0 - mask)
            w = nn.softmax(logits, axis=-1)
            out = jnp.einsum("bHts,bsHd->btHd", w, vp)
        return jnp.einsum("btHd,Hdo->bto", out, ok)


class MHANet(nn.Module):
    """MHANet V1 (ref: deepxi/network/attention.py:15-101)."""
    n_outp: int
    d_model: int = 256
    n_blocks: int = 5
    n_heads: int = 8
    causal: bool = True
    outp_act: str = "Sigmoid"
    warmup_steps: int = 40000

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        att_mask, seq_mask = attention_masks(inp, self.causal)

        x = conv1d(self.d_model, 1, 1, self.causal, False, "in_conv")(inp)
        x = nn.LayerNorm(epsilon=1e-6, name="in_ln")(x)
        x = nn.relu(x)

        d_ff = self.d_model * 4
        for i in range(self.n_blocks):
            h = MultiHeadAttentionV1(self.d_model, self.n_heads,
                                     name=f"block{i}_mha")(x, x, x, att_mask, seq_mask)
            x = nn.LayerNorm(epsilon=1e-6, name=f"block{i}_ln1")(x + h)
            h = nn.Dense(d_ff, name=f"block{i}_ff1")(x)
            h = nn.relu(h)
            h = nn.Dense(self.d_model, name=f"block{i}_ff2")(h)
            x = nn.LayerNorm(epsilon=1e-6, name=f"block{i}_ln2")(x + h)

        x = conv1d(self.n_outp, 1, 1, self.causal, True, "out_conv")(x)
        return output_activation(x, self.outp_act)


class MHANetV2(nn.Module):
    """MHANet V2 with tfa-style attention (ref: deepxi/network/attention.py:278-353)."""
    n_outp: int
    d_model: int = 256
    n_blocks: int = 5
    n_heads: int = 8
    causal: bool = True
    outp_act: str = "Sigmoid"
    warmup_steps: int = 40000
    attention_impl: str = "full"   # "block" for O(T*block) long-audio memory
    block_q: int = 256

    def positional(self, x: jnp.ndarray) -> jnp.ndarray:
        return x  # V2 has no positional encoding

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        if self.attention_impl in ("block", "fused", "stream"):
            # never materialise [T, T]: per-block masks rebuild from [B, T]
            mask, valid = None, sequence_valid_mask(inp)
        else:
            mask, valid = attention_mask_v2(inp, self.causal), None

        x = conv1d(self.d_model, 1, 1, self.causal, False, "in_conv")(inp)
        x = nn.LayerNorm(epsilon=1e-6, name="in_ln")(x)
        x = nn.relu(x)
        x = self.positional(x)

        d_k = self.d_model // self.n_heads
        d_ff = self.d_model * 4
        for i in range(self.n_blocks):
            h = TFAMultiHeadAttention(head_size=d_k, num_heads=self.n_heads,
                                      output_size=self.d_model,
                                      impl=self.attention_impl,
                                      block_q=self.block_q,
                                      name=f"block{i}_mha")(
                x, x, x, mask=mask, valid=valid, causal=self.causal)
            x = nn.LayerNorm(epsilon=1e-6, name=f"block{i}_ln1")(x + h)
            h = nn.Dense(d_ff, name=f"block{i}_ff1")(x)
            h = nn.relu(h)
            h = nn.Dense(self.d_model, name=f"block{i}_ff2")(h)
            x = nn.LayerNorm(epsilon=1e-6, name=f"block{i}_ln2")(x + h)

        x = conv1d(self.n_outp, 1, 1, self.causal, True, "out_conv")(x)
        return output_activation(x, self.outp_act)


class MHANetV3(MHANetV2):
    """MHANetV2 + learned BERT-style positional embedding
    (ref: deepxi/network/attention.py:387-442)."""
    max_len: int = 2048

    def positional(self, x: jnp.ndarray) -> jnp.ndarray:
        T = x.shape[1]
        emb = nn.Embed(self.max_len, self.d_model, name="pos_emb")
        pos = jnp.arange(T) % self.max_len  # guard T > max_len like tf Embedding would OOB
        return x + emb(pos)[None]
