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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
