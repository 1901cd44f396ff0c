"""Fused multi-head attention forward kernel (Pallas).

The MHANet family is attention-memory-bound on TPU: the full path
materialises [B, H, T, T] logits and weights in HBM (~800 MB at the
mhanet-1.1c bench point B=64, T=625), and that traffic — not the matmul
FLOPs — sets the inference wall-clock. This kernel tiles queries and keeps
each (batch, query-block) cell's K/V panels plus one head's [block_q, T]
logits entirely in VMEM, so the T x T score matrix never exists in HBM.

Semantics: exactly the tfa convention of ``TFAMultiHeadAttention``
(ref: deepxi/network/attention.py:278-385; flax twin in
deepxi_tpu/models/attention.py): ``logits += -1e10 * (1 - mask)`` with
``mask = valid_q & valid_k [& causal]``, then a full-row softmax. Because
the mask is additive (not -inf hard masking), masked keys contribute an
exactly-zero exp() term after row-max subtraction, and fully-masked
(padded) query rows degrade to softmax(raw logits) — both reproduced here,
so valid rows match the full path to float rounding
(tests/test_mha_fused.py). Rows beyond the true T (query padding to the
block size) additionally see the padded keys; they are discarded by the
caller and never attended to by valid queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF_V2 = -1.0e10  # tfa's masking constant

# Same rationale as tcn_fused: DEFAULT (one bf16 pass, f32 accumulate)
# matches the XLA full path's own default matmul precision on TPU.
_PRECISION = jax.lax.Precision.DEFAULT


def _dot_qk(q, k):
    """[bq, d] x [T, d] -> [bq, T] contraction over d (no transpose)."""
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PRECISION)


def _dot_wv(w, v):
    return jnp.dot(w, v, preferred_element_type=jnp.float32,
                   precision=_PRECISION)


def flash_attention(qp: jnp.ndarray, kp: jnp.ndarray, vp: jnp.ndarray,
                    valid: jnp.ndarray, causal: bool,
                    block_q: int = 256,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Masked multi-head attention without materialising [B, H, T, T].

    Args:
      qp/kp/vp: [B, T, H, d] projected (and, for q, pre-scaled) heads.
      valid: [B, T] bool frame-validity mask (Keras Masking(0.0) semantics).
      causal: apply the lower-triangular mask.
      block_q: query tile; live logits per head are [block_q, T_padded].
    Returns:
      [B, T, H, d] attention output (pre output-projection).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, T, H, d = qp.shape
    Hd = H * d
    # pad keys/queries to lane/tile-friendly sizes; padded frames are
    # invalid so the additive mask handles them exactly
    Tk = -(-T // 128) * 128
    Tq = -(-T // block_q) * block_q
    q2 = jnp.pad(qp.reshape(B, T, Hd), ((0, 0), (0, Tq - T), (0, 0)))
    k2 = jnp.pad(kp.reshape(B, T, Hd), ((0, 0), (0, Tk - T), (0, 0)))
    v2 = jnp.pad(vp.reshape(B, T, Hd), ((0, 0), (0, Tk - T), (0, 0)))
    # masks carried as [B, 1, T*]: the unit middle axis keeps the trailing
    # two block dims inside Mosaic's (8, 128)-divisible-or-full rule
    vf = valid.astype(jnp.float32)[:, None, :]
    vq = jnp.pad(vf, ((0, 0), (0, 0), (0, Tq - T)))
    vk = jnp.pad(vf, ((0, 0), (0, 0), (0, Tk - T)))

    def kernel(q_ref, k_ref, v_ref, vq_ref, vk_ref, o_ref):
        qb = pl.program_id(1)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (block_q, Tk), 0)
                + qb * block_q)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, Tk), 1)
        m = vq_ref[0, 0][:, None] * vk_ref[0, 0][None, :]
        if causal:
            m = m * (cols <= rows).astype(jnp.float32)
        add = NEG_INF_V2 * (1.0 - m)
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            logits = _dot_qk(q_ref[0, :, sl], k_ref[0, :, sl]) + add
            w = jax.nn.softmax(logits, axis=-1)
            o_ref[0, :, sl] = _dot_wv(w, v_ref[0, :, sl])

    out = pl.pallas_call(
        kernel,
        grid=(B, Tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, Hd), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, Hd), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, Hd), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Hd), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq, Hd), jnp.float32),
        interpret=interpret,
    )(q2, k2, v2, vq, vk)
    return out[:, :T].reshape(B, T, H, d)
