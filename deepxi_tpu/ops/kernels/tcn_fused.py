"""Fused multi-block TCN forward kernel (Pallas).

The ResNetV2 stack is HBM-bandwidth-bound: each of the 40 bottleneck blocks
round-trips [B, T, 256] activations (plus two [B, T, 64] intermediates)
through HBM. This kernel runs a GROUP of consecutive blocks entirely in
VMEM: a time tile (plus a causal halo covering the group's total dilation
reach) is loaded once, all group blocks' LN/ReLU/matmul/dilated-conv work
happens on-chip, and only the final residual output is written back --
~6x less HBM traffic per group of 5.

Semantics: exactly ResNetV2's "ReLU->LN->W+b" causal blocks
(ref: deepxi/network/tcn.py:116-225; flax twin in deepxi_tpu/models/tcn.py),
verified to float tolerance in tests/test_tcn_fused.py.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepxi_tpu.models.tcn import cyclic_dilation


class BlockWeights(NamedTuple):
    """One bottleneck block (kernel layouts as in the flax model)."""
    w1: jnp.ndarray  # [1, d_model, d_f]
    b1: jnp.ndarray  # [d_f]
    w2: jnp.ndarray  # [k, d_f, d_f]
    b2: jnp.ndarray  # [d_f]
    w3: jnp.ndarray  # [1, d_f, d_model]
    b3: jnp.ndarray  # [d_model]


def _ln(x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


# DEFAULT (single-pass bf16 multiply, f32 accumulate) wins on TPU: measured
# 3.1 ms vs 5.3 ms XLA vs 11.0 ms at HIGHEST (B=32, T=640, 40 blocks).
# Output deviation vs the f32 XLA reference on a trained net is ~2e-2 in the
# sigmoid output for EITHER in-kernel precision (op-order chaos through 40
# saturating blocks), so HIGHEST buys nothing here.
_PRECISION = jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PRECISION)


def fused_block_group_whole(x: jnp.ndarray, weights: Sequence[BlockWeights],
                            dilations: Sequence[int], k: int = 3,
                            batch_group: int = 1,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Apply a group of causal ReLU->LN->W+b bottleneck blocks in one Pallas
    kernel with the WHOLE sequence resident in VMEM (no time tiling).

    When T fits on-chip this beats the halo-tiled kernel ~1.2x: the halo
    rows are pure zero-padding for a whole sequence, so instead of carrying
    a shrinking window (and computing on dead pre-sequence rows) each
    dilated conv zero-pads its own input by its reach -- exactly the flax
    model's causal padding -- and every block runs at constant width T.
    Output is bit-identical to `fused_block_group` (tests/test_tcn_fused.py).

    batch_group > 1 processes that many batch rows per grid cell: the 1x1
    matmuls flatten [Bg, T, C] -> [Bg*T, C] (rows independent) and the
    dilated conv pads per-row, so numerics are unchanged while the MXU sees
    Bg x taller matmuls. MEASURED NOT TO PAY on v5e at the flagship shape
    (B=96, T=625): bg=1 115.8k RTF, bg=2 91.7k (bigger live blocks squeeze
    out the grid's double-buffering), bg=4 scoped-VMEM OOM (16.8M > 16M).
    Kept because the flattening is free at bg=1 and the knob documents the
    experiment; default stays 1.

    NEGATIVE RESULT (tap stacking, tried 2026-08, round 3): running the
    dilated conv as ONE [M, k*d_f] @ [k*d_f, d_f] matmul over a
    tap-stacked input (fewer, K-deeper MXU passes: ceil(192/128)=2 vs 3,
    est. ~14% fewer MXU cycles/block) cannot be expressed in Mosaic for
    this kernel: the k shifted slices of the per-row padded input live at
    sublane offsets j*d (d in {1, 2, 4}), and BOTH lane-dim concatenate
    and band-pad+add of such slices are rejected with "result/input
    offset mismatch on non-concat dimension". A per-tap realignment copy
    would cost more VPU traffic than the MXU saving, so the accumulated
    per-tap matmuls below stay.

    Args/returns as `fused_block_group`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, T, C = x.shape
    G = len(weights)
    Bg = max(1, batch_group)
    Tpad = -(-T // 8) * 8  # sublane alignment
    Bpad = -(-B // Bg) * Bg
    if Tpad != T or Bpad != B:
        x = jnp.pad(x, ((0, Bpad - B), (0, Tpad - T), (0, 0)))

    def kernel(x_ref, *refs):
        w_refs, o_ref = refs[:-1], refs[-1]
        h = x_ref[...].reshape(Bg * Tpad, C)
        W = Tpad
        for g in range(G):
            d = dilations[g]
            w1, b1, w2, b2, w3, b3 = w_refs[6 * g: 6 * g + 6]
            reach = (k - 1) * d
            a = _ln(jax.nn.relu(h))
            u1 = _dot(a, w1[...][0]) + b1[...][0]
            a2 = _ln(jax.nn.relu(u1))
            # causal dilated conv via per-tap shifted slices of the
            # PER-ROW zero-padded input: out[t] = sum_j a2[t-(k-1-j)d] @ W[j]
            df = a2.shape[-1]
            a2p = jnp.pad(a2.reshape(Bg, Tpad, df),
                          ((0, 0), (reach, 0), (0, 0)))
            y = _dot(a2p[:, (k - 1) * d:(k - 1) * d + W]
                     .reshape(Bg * W, df), w2[...][k - 1])
            for j in range(k - 1):
                y = y + _dot(a2p[:, j * d: j * d + W].reshape(Bg * W, df),
                             w2[...][j])
            y = y + b2[...][0]
            a3 = _ln(jax.nn.relu(y))
            h = h + _dot(a3, w3[...][0]) + b3[...][0]
        o_ref[...] = h.reshape(Bg, Tpad, C)

    w_specs = []
    w_args = []
    for bw in weights:
        for arr in bw:
            if arr.ndim == 1:
                arr = arr[None, :]
            w_specs.append(pl.BlockSpec(
                arr.shape, lambda b, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))
            w_args.append(arr)

    out = pl.pallas_call(
        kernel,
        grid=(Bpad // Bg,),
        in_specs=[
            pl.BlockSpec((Bg, Tpad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((Bg, Tpad, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bpad, Tpad, C), jnp.float32),
        interpret=interpret,
    )(x, *w_args)
    return out[:B, :T]


def fused_block_group_whole_pack2(x: jnp.ndarray,
                                  weights: Sequence[BlockWeights],
                                  dilations: Sequence[int], k: int = 3,
                                  ln_mode: str = "slice",
                                  interpret: bool | None = None
                                  ) -> jnp.ndarray:
    """`fused_block_group_whole` with TWO batch rows packed into the
    d_f=64 lane gap (round-3 VERDICT next #4's lever, measured by
    tools/mxu_probe.py).

    The production chain runs at ~29 TFLOP/s because its inner matmuls
    are N=64/K=64 -- half-lane, half-depth MXU tiles; the identical chain
    at d_f=128 measures 93 TFLOP/s and is FASTER in absolute time at
    2.5x the FLOPs (results/hw_evidence_r4/mxu_probe.log). So: rows 2b
    and 2b+1 run per grid cell with their d_f-domain activations
    CONCATENATED ALONG LANES (offsets 0/64) and block-diagonal weights --
    every matmul at N,K >= 128 for 2x padded FLOPs. Numerics are
    IDENTICAL to the unpacked kernel: the block-diagonal zeros contribute
    exact 0.0 terms, row (sublane) shifts for the dilated taps apply to
    both lane halves equally, and the segmented LN computes each half's
    moments separately.

    ln_mode: 'slice' takes per-half moments over lane slices (exact);
    'matmul' uses an MXU block-average matrix (E[x], E[x^2] -- ~1e-6
    var-formula rounding). Both are Mosaic-accepted; 'slice' measures
    faster (no extra MXU passes).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, T, C = x.shape
    G = len(weights)
    d_f = weights[0].w1.shape[-1]
    Tpad = -(-T // 8) * 8
    Bpad = -(-B // 2) * 2
    if Tpad != T or Bpad != B:
        x = jnp.pad(x, ((0, Bpad - B), (0, Tpad - T), (0, 0)))

    def blockdiag(a, b):
        z1 = jnp.zeros((a.shape[0], b.shape[1]), a.dtype)
        z2 = jnp.zeros((b.shape[0], a.shape[1]), a.dtype)
        return jnp.block([[a, z1], [z2, b]])

    packed = []
    for bw in weights:
        packed.append((
            blockdiag(bw.w1[0], bw.w1[0]),                    # [2C, 2d_f]
            jnp.concatenate([bw.b1, bw.b1])[None, :],          # [1, 2d_f]
            *[blockdiag(bw.w2[j], bw.w2[j]) for j in range(k)],
            jnp.concatenate([bw.b2, bw.b2])[None, :],
            blockdiag(bw.w3[0], bw.w3[0]),                    # [2d_f, 2C]
            bw.b3[None, :],                                   # [1, C]
        ))
    n_w = k + 5

    avg = np.zeros((2 * d_f, 2 * d_f), np.float32)
    avg[:d_f, :d_f] = 1.0 / d_f
    avg[d_f:, d_f:] = 1.0 / d_f
    avg = jnp.asarray(avg)

    def seg_ln(u, avg_ref, eps=1e-6):
        if ln_mode == "matmul":
            m = _dot(u, avg_ref[...])
            v = _dot(u * u, avg_ref[...]) - m * m
            return (u - m) * jax.lax.rsqrt(v + eps)
        ua, ub = u[:, :d_f], u[:, d_f:]

        def one(z):
            mu = jnp.mean(z, -1, keepdims=True)
            var = jnp.mean(jnp.square(z - mu), -1, keepdims=True)
            return (z - mu) * jax.lax.rsqrt(var + eps)

        return jnp.concatenate([one(ua), one(ub)], axis=-1)

    def kernel(x_ref, avg_ref, *refs):
        w_refs, o_ref = refs[:-1], refs[-1]
        ha, hb = x_ref[0], x_ref[1]
        for g in range(G):
            d = dilations[g]
            ws = w_refs[n_w * g: n_w * g + n_w]
            w1p, b1p = ws[0], ws[1]
            w2p, b2p = ws[2:2 + k], ws[2 + k]
            w3p, b3p = ws[3 + k], ws[4 + k]
            reach = (k - 1) * d
            a_cat = jnp.concatenate([_ln(jax.nn.relu(ha)),
                                     _ln(jax.nn.relu(hb))], axis=-1)
            u1 = _dot(a_cat, w1p[...]) + b1p[...][0]
            a2 = seg_ln(jax.nn.relu(u1), avg_ref)
            a2p = jnp.pad(a2, ((reach, 0), (0, 0)))
            y = _dot(a2p[(k - 1) * d:(k - 1) * d + Tpad], w2p[k - 1][...])
            for j in range(k - 1):
                y = y + _dot(a2p[j * d: j * d + Tpad], w2p[j][...])
            y = y + b2p[...][0]
            a3 = seg_ln(jax.nn.relu(y), avg_ref)
            u3 = _dot(a3, w3p[...])
            ha = ha + u3[:, :C] + b3p[...][0]
            hb = hb + u3[:, C:] + b3p[...][0]
        o_ref[0] = ha
        o_ref[1] = hb

    w_specs, w_args = [], []
    for bw in packed:
        for arr in bw:
            w_specs.append(pl.BlockSpec(
                arr.shape, lambda b, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))
            w_args.append(arr)

    out = pl.pallas_call(
        kernel,
        grid=(Bpad // 2,),
        in_specs=[
            pl.BlockSpec((2, Tpad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(avg.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((2, Tpad, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bpad, Tpad, C), jnp.float32),
        interpret=interpret,
    )(x, avg, *w_args)
    return out[:B, :T]


def fused_block_group(x: jnp.ndarray, weights: Sequence[BlockWeights],
                      dilations: Sequence[int], k: int = 3,
                      tile_t: int = 256, interpret: bool | None = None
                      ) -> jnp.ndarray:
    """Apply a group of causal ReLU->LN->W+b bottleneck blocks in one Pallas
    kernel.

    Args:
      x: [B, T, d_model] activations.
      weights: per-block weights (group size G).
      dilations: per-block dilation of the middle conv.
    Returns:
      [B, T, d_model] group output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, T, C = x.shape
    G = len(weights)
    halo = sum((k - 1) * d for d in dilations)
    halo = -(-halo // 8) * 8  # sublane-align the halo
    if halo > tile_t:
        raise ValueError(f"group dilation reach {halo} exceeds tile_t "
                         f"{tile_t}; reduce the group size or grow the tile")
    Tpad = -(-T // tile_t) * tile_t
    if Tpad != T:
        x = jnp.pad(x, ((0, 0), (0, Tpad - T), (0, 0)))
    # previous tile (for the causal halo): tile t of xprev is tile t-1 of x
    xprev = jnp.pad(x, ((0, 0), (tile_t, 0), (0, 0)))[:, :Tpad]

    def kernel(x_ref, xp_ref, *refs):
        w_refs, o_ref = refs[:-1], refs[-1]
        window = jnp.concatenate([xp_ref[0][tile_t - halo:], x_ref[0]], axis=0)
        # off: where tile position 0 sits inside the shrinking window
        off = halo
        h = window
        # On the first time tile the halo rows are pre-sequence: the flax
        # reference zero-pads each dilated conv's INPUT ACTIVATIONS there,
        # whereas the window would carry bias-propagated values -- zero the
        # pre-sequence rows of a2 before every dilated conv.
        is_first = pl.program_id(1) == 0
        for g in range(G):
            d = dilations[g]
            w1, b1, w2, b2, w3, b3 = w_refs[6 * g: 6 * g + 6]
            reach = (k - 1) * d
            # unit 1 (1x1): compute on the part still needed downstream
            a = _ln(jax.nn.relu(h))
            u1 = _dot(a, w1[...][0]) + b1[...][0]        # [W, d_f]
            # unit 2 (dilated conv, causal): out[t] = sum_j u1[t-(k-1-j)d] Wj
            a2 = _ln(jax.nn.relu(u1))
            if off > 0:
                rows = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0)
                pre = jnp.logical_and(is_first, rows < off)
                a2 = jnp.where(pre, 0.0, a2)
            W_out = a2.shape[0] - reach
            y = _dot(a2[reach:], w2[...][k - 1])
            for j in range(k - 1):
                sl = a2[j * d: j * d + W_out]
                y = y + _dot(sl, w2[...][j])
            y = y + b2[...][0]
            # unit 3 (1x1) + residual against the matching slice of h
            a3 = _ln(jax.nn.relu(y))
            u3 = _dot(a3, w3[...][0]) + b3[...][0]
            h = h[reach:] + u3
            off -= reach
        o_ref[0] = h[off:]

    w_specs = []
    w_args = []
    for bw in weights:
        for arr in bw:
            if arr.ndim == 1:  # biases as [1, C] (TPU wants >=2-D blocks)
                arr = arr[None, :]
            w_specs.append(pl.BlockSpec(
                arr.shape, lambda b, t, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))
            w_args.append(arr)

    out = pl.pallas_call(
        kernel,
        grid=(B, Tpad // tile_t),
        in_specs=[
            pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tpad, C), jnp.float32),
        interpret=interpret,
    )(x, xprev, *w_args)
    return out[:, :T]


def resnetv2_apply_fused(params, x: jnp.ndarray, n_blocks: int = 40,
                         max_d_rate: int = 16, k: int = 3,
                         group: int = 20, tile_t: int = 640,
                         whole_max_t: int = 1024, batch_group: int = 1,
                         pack2: bool = False, pack2_ln: str = "slice",
                         outp_act: str = "Sigmoid") -> jnp.ndarray:
    """ResNetV2 forward (causal, ReLU->LN->W+b, Sigmoid) with the block
    stack running through fused Pallas group kernels. Drop-in equivalent of
    `ResNetV2.apply` for the flagship configuration.

    Sequences up to ``whole_max_t`` frames (~16 s audio at the flagship
    framing) run the whole-sequence VMEM kernel (no time tiling, ~1.2x);
    longer ones use the halo-tiled kernel. ``pack2=True`` routes the
    whole-sequence path through the lane-packed two-rows-per-cell kernel
    (fused_block_group_whole_pack2).
    """
    p = params["params"]
    whole = x.shape[1] <= whole_max_t

    h = _dot(x, p["ff_conv"]["kernel"][0]) + p["ff_conv"]["bias"]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + 1e-6) * p["ff_ln"]["scale"]
    h = jax.nn.relu(h)

    dil = [cyclic_dilation(i, max_d_rate) for i in range(n_blocks)]
    for g0 in range(0, n_blocks, group):
        idx = range(g0, min(g0 + group, n_blocks))
        weights = [BlockWeights(
            w1=p[f"block{i}_u1_conv"]["kernel"], b1=p[f"block{i}_u1_conv"]["bias"],
            w2=p[f"block{i}_u2_conv"]["kernel"], b2=p[f"block{i}_u2_conv"]["bias"],
            w3=p[f"block{i}_u3_conv"]["kernel"], b3=p[f"block{i}_u3_conv"]["bias"],
        ) for i in idx]
        if whole and pack2:
            h = fused_block_group_whole_pack2(h, weights,
                                              [dil[i] for i in idx], k=k,
                                              ln_mode=pack2_ln)
        elif whole:
            h = fused_block_group_whole(h, weights, [dil[i] for i in idx],
                                        k=k, batch_group=batch_group)
        else:
            h = fused_block_group(h, weights, [dil[i] for i in idx], k=k,
                                  tile_t=tile_t)

    out = _dot(h, p["out_conv"]["kernel"][0]) + p["out_conv"]["bias"]
    from deepxi_tpu.models.tcn import output_activation
    return output_activation(out, outp_act)
