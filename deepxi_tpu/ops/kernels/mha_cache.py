"""Fused KV-cache attention step for streaming MHANet (Pallas).

The streaming per-hop attention step (deepxi_tpu/streaming.py
StreamingMHANet._net_step) is HBM-bound and dispatch-bound: every 16 ms
hop it launches ~10 small XLA ops per block, each re-reading the full
[B, max_len, H, d] K/V caches in float32. This kernel computes one
block's whole cache-attention step -- score the single query row against
the cache, additive-mask the unwritten tail, softmax, weight the values
-- in ONE launch per block with the cache panels streamed through VMEM,
and works unchanged with bfloat16-resident caches (halving the HBM
traffic that sets streaming capacity).

Semantics match the unfused step exactly: ``logits += -1e10 * (1-valid)``
(the tfa convention, ref: deepxi/network/attention.py:355-385) followed by
a full-row softmax in float32. Parity vs the einsum step is asserted in
tests/test_streaming_mha.py; the reference has no streaming path at all
(SURVEY.md section 2f) -- this is a beyond-parity capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10
_PRECISION = jax.lax.Precision.DEFAULT


def mha_cache_step(q: jnp.ndarray, kc: jnp.ndarray, vc: jnp.ndarray,
                   valid: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """One streaming attention step against the KV cache.

    Args:
      q:  [B, H, d] pre-scaled query for the current frame (float32).
      kc: [B, L, H, d] key cache (float32 or bfloat16).
      vc: [B, L, H, d] value cache (same dtype as kc).
      valid: [L] float 0/1 mask of written cache rows (arange(L) <= t).
    Returns:
      [B, H, d] float32 attention output (pre output-projection).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, L, H, d = kc.shape
    Hd = H * d
    k2 = kc.reshape(B, L, Hd)
    v2 = vc.reshape(B, L, Hd)
    q2 = q.reshape(B, 1, Hd)
    vmask = valid.astype(jnp.float32).reshape(1, 1, L)

    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        add = NEG_INF * (1.0 - m_ref[0, 0])[None, :]  # [1, L]
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            k = k_ref[0, :, sl].astype(jnp.float32)
            logits = jax.lax.dot_general(
                q_ref[0, :, sl], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_PRECISION) + add
            w = jax.nn.softmax(logits, axis=-1)
            v = v_ref[0, :, sl].astype(jnp.float32)
            o_ref[0, :, sl] = jnp.dot(w, v,
                                      preferred_element_type=jnp.float32,
                                      precision=_PRECISION)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, Hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Hd), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Hd), jnp.float32),
        interpret=interpret,
    )(q2, k2, v2, vmask)
    return out.reshape(B, H, d)
