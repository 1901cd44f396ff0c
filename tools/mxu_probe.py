"""MXU occupancy probe for the fused-TCN wall (round-3 VERDICT weak #2).

The flagship pipelines plateau at ~34-36 TFLOP/s (~18% MFU vs the v5e
bf16 peak of ~197). docs/PERF.md diagnoses "d_f=64 half-lane MXU tiles +
VPU-serial LN chains" -- a plausible story that was never *measured*.
This probe isolates the variables with four kernels that share the fused
TCN's exact structure (whole-sequence VMEM residency, same grid, same
matmul sequence per block: [M,256]@[256,64] -> 3x[M,64]@[64,64] taps ->
[M,64]@[64,256]):

  full      the production chain (ReLU + LN + matmuls)  = achieved
  bare      LN and ReLU stripped, matmuls only          = VPU-serial cost
  bare128   bare with d_f=128 (full-lane MXU tiles)     = half-lane cost
  square    chain of [M,256]@[256,256]                  = speed of light
            for this access pattern

If bare ~= full, the VPU chain is NOT the wall (it overlaps or is
negligible); if bare128's TFLOP/s ~= 2x bare's, the d_f=64 lane gap is
the wall and it is a topology constant of the reference model, not a
kernel defect. square bounds what ANY kernel with this residency can do.

Usage (on the real chip, via the tpuq queue):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/mxu_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PRECISION)


def _ln(x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def make_chain(G=20, C=256, d_f=64, k=3, T=624, with_ln=True,
               with_relu=True, square=False, interpret=None):
    """A pallas_call structurally identical to fused_block_group_whole,
    with the nonlinearities optionally stripped. Returns (fn, flops_per_row)
    where fn(x[B,T,C]) -> [B,T,C]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rs = np.random.RandomState(0)

    def w(*shape):
        return jnp.asarray(rs.randn(*shape).astype(np.float32) * 0.05)

    if square:
        weights = [(w(C, C),) for _ in range(G)]
        flops_per_row = G * 2 * C * C
    else:
        weights = [(w(C, d_f), w(k, d_f, d_f), w(d_f, C)) for _ in range(G)]
        flops_per_row = G * 2 * (C * d_f + k * d_f * d_f + d_f * C)

    def kernel(x_ref, *refs):
        w_refs, o_ref = refs[:-1], refs[-1]
        h = x_ref[0]
        for g in range(G):
            if square:
                a = h
                if with_relu:
                    a = jax.nn.relu(a)
                if with_ln:
                    a = _ln(a)
                h = h + _dot(a, w_refs[g][...])
                continue
            w1, w2, w3 = w_refs[3 * g: 3 * g + 3]
            a = h
            if with_relu:
                a = jax.nn.relu(a)
            if with_ln:
                a = _ln(a)
            u1 = _dot(a, w1[...])
            a2 = u1
            if with_relu:
                a2 = jax.nn.relu(a2)
            if with_ln:
                a2 = _ln(a2)
            # the production kernel's 3 per-tap matmuls (same input here:
            # the tap SHIFTS are free VMEM slicing, not MXU work)
            y = _dot(a2, w2[...][k - 1])
            for j in range(k - 1):
                y = y + _dot(a2, w2[...][j])
            a3 = y
            if with_relu:
                a3 = jax.nn.relu(a3)
            if with_ln:
                a3 = _ln(a3)
            h = h + _dot(a3, w3[...])
        o_ref[0] = h

    w_specs, w_args = [], []
    for bw in weights:
        for arr in bw:
            w_specs.append(pl.BlockSpec(arr.shape,
                                        functools.partial(
                                            lambda n, b: (0,) * n, arr.ndim),
                                        memory_space=pltpu.VMEM))
            w_args.append(arr)

    def fn(x):
        B = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM), *w_specs],
            out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
            interpret=interpret,
        )(x, *w_args)

    return fn, flops_per_row


def make_pack2_chain(G=20, C=256, d_f=64, k=3, T=624, ln_mode="matmul",
                     with_relu=True, interpret=None):
    """The round-3 VERDICT's 'pack two batch rows into the d_f=64 lane
    gap' lever, as a measurable probe: TWO batch rows per grid cell with
    their d_f-domain activations CONCATENATED ALONG LANES (offsets 0/64
    inside a 128-lane tile) and block-diagonal weights, so every matmul
    runs at N,K >= 128 (full MXU tiles) at 2x the raw FLOPs -- worth it
    if the d_f=64 efficiency gap (measured 33.7 vs 93.1 TFLOP/s) exceeds
    the 2x padding overhead.

    ln_mode: how the per-half (segmented) LayerNorm gets its moments:
      'none'    skip LN (isolates the matmul win)
      'matmul'  x @ blockdiag(J/64, J/64): per-half means via one MXU op
      'slice'   jnp.mean over lane slices [:, :64] / [:, 64:] (alignment
                experiment -- Mosaic may reject or relayout-copy)
    Returns (fn, useful_flops_per_rowpair) where fn(x[B,T,C]) -> [B,T,C]
    and the flops count only the UNPACKED computation's useful work.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rs = np.random.RandomState(0)

    def w(*shape):
        return jnp.asarray(rs.randn(*shape).astype(np.float32) * 0.05)

    def blockdiag(a, b):
        out = np.zeros((a.shape[0] + b.shape[0], a.shape[1] + b.shape[1]),
                       np.float32)
        out[:a.shape[0], :a.shape[1]] = a
        out[a.shape[0]:, a.shape[1]:] = b
        return jnp.asarray(out)

    weights = []
    for _ in range(G):
        w1, w2, w3 = (np.asarray(w(C, d_f)), np.asarray(w(k, d_f, d_f)),
                      np.asarray(w(d_f, C)))
        weights.append((
            blockdiag(w1, w1),                            # [2C, 2d_f]
            *[blockdiag(w2[j], w2[j]) for j in range(k)],  # [2d_f, 2d_f]
            blockdiag(w3, w3),                            # [2d_f, 2C]
        ))
    n_w = 2 + k
    # useful flops per PAIR of rows = 2x the unpacked per-row chain
    flops_pair = 2 * G * 2 * (C * d_f + k * d_f * d_f + d_f * C)

    avg = np.zeros((2 * d_f, 2 * d_f), np.float32)
    avg[:d_f, :d_f] = 1.0 / d_f
    avg[d_f:, d_f:] = 1.0 / d_f
    avg = jnp.asarray(avg)

    def seg_ln(x, avg_ref, eps=1e-6):
        if ln_mode == "none":
            return x
        if ln_mode == "matmul":
            m = _dot(x, avg_ref)
            v = _dot(x * x, avg_ref) - m * m
            return (x - m) * jax.lax.rsqrt(v + eps)
        # 'slice': per-half moments over lane slices
        xa, xb = x[:, :d_f], x[:, d_f:]
        ya = (xa - jnp.mean(xa, -1, keepdims=True)) * jax.lax.rsqrt(
            jnp.var(xa, -1, keepdims=True) + eps)
        yb = (xb - jnp.mean(xb, -1, keepdims=True)) * jax.lax.rsqrt(
            jnp.var(xb, -1, keepdims=True) + eps)
        return jnp.concatenate([ya, yb], axis=-1)

    def ln_full(x, eps=1e-6):
        mu = jnp.mean(x, -1, keepdims=True)
        v = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(v + eps)

    def kernel(x_ref, avg_ref, *refs):
        w_refs, o_ref = refs[:-1], refs[-1]
        ha, hb = x_ref[0], x_ref[1]                  # [Tp, C] each
        for g in range(G):
            ws = w_refs[n_w * g: n_w * g + n_w]
            w1p, w2p, w3p = ws[0], ws[1:1 + k], ws[1 + k]
            a_a, a_b = ha, hb
            if with_relu:
                a_a, a_b = jax.nn.relu(a_a), jax.nn.relu(a_b)
            if ln_mode != "none":
                a_a, a_b = ln_full(a_a), ln_full(a_b)   # d_model LN stays
            a_cat = jnp.concatenate([a_a, a_b], axis=-1)   # [Tp, 2C]
            u1 = _dot(a_cat, w1p[...])                     # [Tp, 2d_f]
            a2 = u1
            if with_relu:
                a2 = jax.nn.relu(a2)
            a2 = seg_ln(a2, avg_ref[...])
            y = _dot(a2, w2p[k - 1][...])
            for j in range(k - 1):
                y = y + _dot(a2, w2p[j][...])
            a3 = y
            if with_relu:
                a3 = jax.nn.relu(a3)
            a3 = seg_ln(a3, avg_ref[...])
            u3 = _dot(a3, w3p[...])                        # [Tp, 2C]
            ha = ha + u3[:, :C]
            hb = hb + u3[:, C:]
        o_ref[0] = ha
        o_ref[1] = hb

    w_specs, w_args = [], []
    for bw in weights:
        for arr in bw:
            w_specs.append(pl.BlockSpec(arr.shape,
                                        functools.partial(
                                            lambda n, b: (0,) * n, arr.ndim),
                                        memory_space=pltpu.VMEM))
            w_args.append(arr)

    def fn(x):
        B = x.shape[0]
        assert B % 2 == 0
        return pl.pallas_call(
            kernel,
            grid=(B // 2,),
            in_specs=[pl.BlockSpec((2, T, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(avg.shape, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
                      *w_specs],
            out_specs=pl.BlockSpec((2, T, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
            interpret=interpret,
        )(x, avg, *w_args)

    return fn, flops_pair


def time_fn(fn, x, n_rep=10):
    y = fn(x)
    float(np.asarray(y[0, 0, 0]))  # force completion (block_until_ready
    t0 = time.perf_counter()       # is a no-op on this relay)
    for _ in range(n_rep):
        y = fn(x)
    float(np.asarray(y[0, 0, 0]))
    return (time.perf_counter() - t0) / n_rep


def main():
    B, T, C, G = 96, 624, 256, 20   # the flagship bench point (2 groups
    n_groups = 2                    # of 20 cover resnet-1.1c's 40 blocks)
    x = jnp.asarray(np.random.RandomState(1).randn(B, T, C)
                    .astype(np.float32) * 0.1)
    out = {}
    cases = [
        ("full", dict(with_ln=True, with_relu=True)),
        ("bare", dict(with_ln=False, with_relu=False)),
        ("relu_only", dict(with_ln=False, with_relu=True)),
        ("bare128", dict(with_ln=False, with_relu=False, d_f=128)),
        ("full128", dict(with_ln=True, with_relu=True, d_f=128)),
        ("square", dict(with_ln=False, with_relu=False, square=True)),
    ]
    for name, kw in cases:
        fn, fpr = make_chain(G=G, C=C, T=T, **kw)
        fn = jax.jit(lambda x, f=fn: f(f(x)))  # 2 groups like production
        dt = time_fn(fn, x)
        tflops = n_groups * fpr * B * T / dt / 1e12
        out[name] = {"ms": round(dt * 1e3, 3), "tflops": round(tflops, 2)}
        print(name, out[name], flush=True)

    # the pack2 lever: useful-work TFLOP/s (padding overhead excluded),
    # directly comparable to 'full'/'bare' above
    for name, kw in [("pack2_bare", dict(ln_mode="none", with_relu=False)),
                     ("pack2_matln", dict(ln_mode="matmul")),
                     ("pack2_sliceln", dict(ln_mode="slice"))]:
        try:
            fn, fpp = make_pack2_chain(G=G, C=C, T=T, **kw)
            fn = jax.jit(lambda x, f=fn: f(f(x)))
            dt = time_fn(fn, x)
            tflops = n_groups * fpp * (B // 2) * T / dt / 1e12
            out[name] = {"ms": round(dt * 1e3, 3),
                         "useful_tflops": round(tflops, 2)}
        except Exception as e:  # Mosaic layout rejections are a finding
            out[name] = {"error": str(e)[:300]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
