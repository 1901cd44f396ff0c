"""Differentiable fused TCN stack (Pallas forward + hand-written Pallas
backward) for TRAINING the ResNetV2 family on TPU.

`ops/kernels/tcn_fused.py` fuses groups of bottleneck blocks into VMEM for
inference, but `pallas_call` has no autodiff, so training fell back to the
XLA conv path. This module adds the missing piece: a `jax.custom_vjp`
around the block stack whose backward is itself a fused Pallas kernel.

Memory/recompute strategy (flash-attention-style rematerialisation): the
forward saves ONLY the residual stream at group boundaries (ceil(40/G)
checkpoints instead of ~120 per-layer intermediates). The backward kernel
then, per batch row, (1) replays the group forward storing each block's
input in VMEM scratch, and (2) walks the blocks in reverse recomputing the
intra-block intermediates and accumulating weight gradients across the
batch grid (constant-index output blocks persist in VMEM across the
sequentially-iterated grid, the standard Pallas accumulation pattern).

Semantics: gradients of exactly the ResNetV2 "ReLU->LN->W+b" causal block
(ref: deepxi/network/tcn.py:116-225; flax twin deepxi_tpu/models/tcn.py);
verified against `jax.grad` of the flax model in
tests/test_tcn_fused_train.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from deepxi_tpu.models.tcn import cyclic_dilation, output_activation
from deepxi_tpu.ops.kernels.tcn_fused import (BlockWeights, _dot, _ln,
                                              fused_block_group_whole)

_EPS = 1e-6


def _ln_bwd(u, z):
    """Backward of the affine-free LayerNorm `_ln` at pre-norm input z:
    dz = invs * (u - mean(u) - zhat * mean(u * zhat)) over the feature axis."""
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    invs = jax.lax.rsqrt(var + _EPS)
    zhat = (z - mu) * invs
    return invs * (u - jnp.mean(u, axis=-1, keepdims=True)
                   - zhat * jnp.mean(u * zhat, axis=-1, keepdims=True))


def _dot_t(a, b):
    """a^T @ b with contraction over axis 0 (no transpose materialised)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _dot_bt(a, b):
    """a @ b^T with contraction over the last axis of both."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _block_fwd(h, w1, b1, w2, b2, w3, b3, dil, k):
    """One bottleneck block forward at full width (whole-sequence padding),
    mirroring fused_block_group_whole's body."""
    W = h.shape[0]
    r = (k - 1) * dil
    a = _ln(jax.nn.relu(h))
    u1 = _dot(a, w1) + b1
    a2 = _ln(jax.nn.relu(u1))
    a2p = jnp.pad(a2, ((r, 0), (0, 0)))
    y = _dot(a2p[(k - 1) * dil:(k - 1) * dil + W], w2[k - 1])
    for j in range(k - 1):
        y = y + _dot(a2p[j * dil: j * dil + W], w2[j])
    y = y + b2
    a3 = _ln(jax.nn.relu(y))
    return h + _dot(a3, w3) + b3


def fused_block_group_whole_saved(x: jnp.ndarray,
                                  weights: Sequence[BlockWeights],
                                  dilations: Sequence[int], k: int = 3,
                                  interpret: bool | None = None):
    """`fused_block_group_whole` that ALSO emits each block's input
    activations [B, G, T, C] for a replay-free backward
    (fused_block_group_bwd(saved_h=...))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, T, C = x.shape
    G = len(weights)
    Tpad = -(-T // 8) * 8
    if Tpad != T:
        x = jnp.pad(x, ((0, 0), (0, Tpad - T), (0, 0)))

    def kernel(x_ref, *refs):
        w_refs, o_ref, hs_ref = refs[:-2], refs[-2], refs[-1]
        h = x_ref[0]
        for g in range(G):
            hs_ref[0, g] = h
            w1, b1, w2, b2, w3, b3 = w_refs[6 * g: 6 * g + 6]
            h = _block_fwd(h, w1[...][0], b1[...][0], w2[...], b2[...][0],
                           w3[...][0], b3[...][0], dilations[g], k)
        o_ref[0] = h

    w_specs, w_args = [], []
    for bw in weights:
        for arr in bw:
            if arr.ndim == 1:
                arr = arr[None, :]
            w_specs.append(pl.BlockSpec(
                arr.shape, lambda b, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))
            w_args.append(arr)

    out, hs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Tpad, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM), *w_specs],
        out_specs=(pl.BlockSpec((1, Tpad, C), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, G, Tpad, C), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, Tpad, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, G, Tpad, C), jnp.float32)),
        interpret=interpret,
    )(x, *w_args)
    return out[:, :T], hs[:, :, :T]


def fused_block_group_bwd(h0: jnp.ndarray, dout: jnp.ndarray,
                          weights: Sequence[BlockWeights],
                          dilations: Sequence[int], k: int = 3,
                          saved_h: Optional[jnp.ndarray] = None,
                          interpret: bool | None = None):
    """Backward of `fused_block_group_whole`.

    Args:
      h0: [B, T, C] the GROUP's input activations (the saved checkpoint).
      dout: [B, T, C] gradient w.r.t. the group output.
      saved_h: optional [B, G, T, C] per-block inputs recorded by
        `fused_block_group_whole_saved` -- skips the in-kernel forward
        replay (trades one HBM round-trip of the activations for ~1/3 of
        the backward FLOPs).
    Returns:
      (dh0 [B, T, C], list[BlockWeights] gradients, batch-summed).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, T, C = h0.shape
    G = len(weights)
    Tpad = -(-T // 8) * 8
    if Tpad != T:
        h0 = jnp.pad(h0, ((0, 0), (0, Tpad - T), (0, 0)))
        dout = jnp.pad(dout, ((0, 0), (0, Tpad - T), (0, 0)))
        if saved_h is not None:
            saved_h = jnp.pad(saved_h,
                              ((0, 0), (0, 0), (0, Tpad - T), (0, 0)))
    d_f = weights[0].b1.shape[-1]
    use_saved = saved_h is not None

    def kernel(h0_ref, g_ref, *refs):
        # arg order: inputs (h0, dout, weights, [saved_h]), outputs
        # (dh, dweights), scratch ([hs])
        w_refs = refs[:6 * G]
        if use_saved:
            hs = refs[6 * G]                     # [1, G, Tpad, C] input
            dh_ref = refs[6 * G + 1]
            dw_refs = refs[6 * G + 2: 6 * G + 2 + 6 * G]
        else:
            dh_ref = refs[6 * G]
            dw_refs = refs[6 * G + 1: 6 * G + 1 + 6 * G]
            hs = refs[-1]                        # VMEM scratch [G, Tpad, C]
        b = pl.program_id(0)
        W = Tpad

        def wts(g):
            w1, b1, w2, b2, w3, b3 = w_refs[6 * g: 6 * g + 6]
            return (w1[...][0], b1[...][0], w2[...], b2[...][0],
                    w3[...][0], b3[...][0])

        if not use_saved:
            # pass 1: replay the group forward, stashing each block's input
            h = h0_ref[0]
            for g in range(G):
                hs[g] = h
                w1, b1, w2, b2, w3, b3 = wts(g)
                h = _block_fwd(h, w1, b1, w2, b2, w3, b3, dilations[g], k)

        # pass 2: reverse walk; recompute intra-block intermediates from the
        # stashed inputs and accumulate weight grads over the batch grid
        @pl.when(b == 0)
        def _():
            for ref in dw_refs:
                ref[...] = jnp.zeros(ref.shape, ref.dtype)

        d = g_ref[0]
        for g in range(G - 1, -1, -1):
            w1, b1, w2, b2, w3, b3 = wts(g)
            dil = dilations[g]
            r = (k - 1) * dil
            h = hs[0, g] if use_saved else hs[g]
            z0 = jax.nn.relu(h)
            a = _ln(z0)
            u1 = _dot(a, w1) + b1
            z1 = jax.nn.relu(u1)
            a2 = _ln(z1)
            a2p = jnp.pad(a2, ((r, 0), (0, 0)))
            y = _dot(a2p[(k - 1) * dil:(k - 1) * dil + W], w2[k - 1])
            for j in range(k - 1):
                y = y + _dot(a2p[j * dil: j * dil + W], w2[j])
            y = y + b2
            z2 = jax.nn.relu(y)
            a3 = _ln(z2)

            dw1r, db1r, dw2r, db2r, dw3r, db3r = dw_refs[6 * g: 6 * g + 6]
            # unit 3
            da3 = _dot_bt(d, w3)                    # [W, d_f]
            dw3r[0] += _dot_t(a3, d)
            db3r[0] += jnp.sum(d, axis=0)
            dy = _ln_bwd(da3, z2) * (y > 0)
            # unit 2 (dilated conv)
            db2r[0] += jnp.sum(dy, axis=0)
            for j in range(k):
                dw2r[j] += _dot_t(a2p[j * dil: j * dil + W], dy)
            dyp = jnp.pad(dy, ((0, r), (0, 0)))
            da2 = _dot_bt(dyp[(k - 1) * dil: (k - 1) * dil + W], w2[0])
            for j in range(1, k):
                da2 = da2 + _dot_bt(dyp[(k - 1 - j) * dil:
                                        (k - 1 - j) * dil + W], w2[j])
            du1 = _ln_bwd(da2, z1) * (u1 > 0)
            # unit 1
            dw1r[0] += _dot_t(a, du1)
            db1r[0] += jnp.sum(du1, axis=0)
            da = _dot_bt(du1, w1)
            # input LN/ReLU + residual
            d = d + _ln_bwd(da, z0) * (h > 0)
        dh_ref[0] = d

    w_specs, w_args = [], []
    for bw in weights:
        for arr in bw:
            if arr.ndim == 1:
                arr = arr[None, :]
            w_specs.append(pl.BlockSpec(
                arr.shape, lambda b, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))
            w_args.append(arr)
    dw_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in w_args]
    dw_specs = [pl.BlockSpec(a.shape, lambda b, n=a.ndim: (0,) * n,
                             memory_space=pltpu.VMEM) for a in w_args]

    io_spec = pl.BlockSpec((1, Tpad, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    if use_saved:
        # the recorded activations ride in as the LAST input (the kernel's
        # `hs`), one [1, G, Tpad, C] block per grid cell; no scratch
        extra_in = [saved_h]
        extra_specs = [pl.BlockSpec((1, G, Tpad, C), lambda b: (b, 0, 0, 0),
                                    memory_space=pltpu.VMEM)]
        scratch = []
    else:
        extra_in, extra_specs = [], []
        scratch = [pltpu.VMEM((G, Tpad, C), jnp.float32)]
    dh, *dws = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[io_spec, io_spec, *w_specs, *extra_specs],
        out_specs=(io_spec, *dw_specs),
        out_shape=(jax.ShapeDtypeStruct((B, Tpad, C), jnp.float32),
                   *dw_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(h0, dout, *w_args, *extra_in)

    dweights = []
    for g in range(G):
        d1, db1, d2, db2, d3, db3 = dws[6 * g: 6 * g + 6]
        dweights.append(BlockWeights(w1=d1, b1=db1[0], w2=d2, b2=db2[0],
                                     w3=d3, b3=db3[0]))
    return dh[:, :T], dweights


# ---------------------------------------------------------------------------
# custom_vjp stack
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stack(static: Tuple, h: jnp.ndarray, flat: Tuple[jnp.ndarray, ...]):
    return _stack_fwd(static, h, flat)[0]


def _groups(n_blocks: int, group: int):
    return [range(g0, min(g0 + group, n_blocks))
            for g0 in range(0, n_blocks, group)]


def _stack_fwd(static, h, flat):
    dilations, k, group, save_acts = static
    n_blocks = len(dilations)
    weights = [BlockWeights(*flat[6 * i: 6 * i + 6]) for i in range(n_blocks)]
    checkpoints, saved = [], []
    for idx in _groups(n_blocks, group):
        checkpoints.append(h)
        gw = [weights[i] for i in idx]
        gd = [dilations[i] for i in idx]
        if save_acts:
            h, hs = fused_block_group_whole_saved(h, gw, gd, k=k)
            saved.append(hs)
        else:
            h = fused_block_group_whole(h, gw, gd, k=k)
    return h, (tuple(checkpoints), tuple(saved), flat)


def _stack_bwd(static, res, dout):
    dilations, k, group, save_acts = static
    checkpoints, saved, flat = res
    n_blocks = len(dilations)
    weights = [BlockWeights(*flat[6 * i: 6 * i + 6]) for i in range(n_blocks)]
    gs = _groups(n_blocks, group)
    dflat = [None] * (6 * n_blocks)
    d = dout
    for gi in range(len(gs) - 1, -1, -1):
        idx = list(gs[gi])
        d, dws = fused_block_group_bwd(
            checkpoints[gi], d, [weights[i] for i in idx],
            [dilations[i] for i in idx], k=k,
            saved_h=saved[gi] if save_acts else None)
        for i, dw in zip(idx, dws):
            for j, arr in enumerate(dw):
                dflat[6 * i + j] = arr
    return d, tuple(dflat)


_stack.defvjp(_stack_fwd, _stack_bwd)


def resnetv2_apply_fused_train(params, x: jnp.ndarray, n_blocks: int = 40,
                               max_d_rate: int = 16, k: int = 3,
                               group: int = 10, save_acts: bool = False,
                               outp_act: str = "Sigmoid") -> jnp.ndarray:
    """Differentiable ResNetV2 forward with the block stack running through
    the fused Pallas forward/backward pair. Drop-in for `network.apply`
    inside the train step (same params tree as the flax ResNetV2).

    `group` bounds the backward kernel's VMEM scratch (group * T * d_model
    floats of stashed block inputs); 10 fits the training buckets
    (T <= 640) comfortably. `save_acts=True` records every block's input
    in the forward and skips the backward's replay pass -- trades an HBM
    round-trip of n_blocks x [B, T, C] activations for ~1/3 of the
    backward FLOPs (use at larger batch where compute dominates).
    """
    p = params["params"]
    h = _dot(x, p["ff_conv"]["kernel"][0]) + p["ff_conv"]["bias"]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + _EPS) * p["ff_ln"]["scale"]
    h = jax.nn.relu(h)

    dilations = tuple(cyclic_dilation(i, max_d_rate) for i in range(n_blocks))
    flat = []
    for i in range(n_blocks):
        bp = p[f"block{i}_u1_conv"], p[f"block{i}_u2_conv"], p[f"block{i}_u3_conv"]
        flat += [bp[0]["kernel"], bp[0]["bias"], bp[1]["kernel"],
                 bp[1]["bias"], bp[2]["kernel"], bp[2]["bias"]]
    h = _stack((dilations, k, group, save_acts), h, tuple(flat))

    out = _dot(h, p["out_conv"]["kernel"][0]) + p["out_conv"]["bias"]
    return output_activation(out, outp_act)
