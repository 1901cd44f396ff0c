"""MXU occupancy probe for the fused transformer block (round-4 VERDICT
next #4: the TCN's 35 TFLOP/s wall was *measured* to be d_f=64 lane
occupancy via tools/mxu_probe.py; the MHANet side asserted the analogous
story -- d_k=32 quarter-depth contractions + VPU-serial softmax,
docs/PERF.md -- but never ran the analogous probe).

Five structural twins of `ops/kernels/mha_block_fused.fused_transformer_
block` (same grid: one batch row per cell, whole sequence in VMEM, same
matmul sequence: per-head QKV [T,C]@[C,dk], scores [T,dk]x[S,dk], AV
[T,S]@[S,dk], out [T,dk]@[dk,C], FFN [T,C]@[C,4C]@[4C,C]), with the
non-matmul work optionally stripped:

  full        production chain (mask + softmax + LN + ReLU)  = achieved
  nosoftmax   softmax replaced by a 1/T scale                = VPU softmax cost
  nomask      mask/iota computation stripped, softmax kept   = mask cost
  bare        matmuls only                                   = all-VPU cost
  bare_dk64   bare with H=4, d_k=64 heads (same total FLOPs) = lane occupancy
  bare_dk128  bare with H=2, d_k=128 (full-depth contractions)
  full_dk64   production chain at H=4/d_k=64 (what a re-headed
              flagship would actually achieve)

H*d_k = 256 is held fixed, so every arm runs the same FLOP count; only
the MXU tile occupancy of the [*, d_k] contractions changes. If
bare_dk128 ~= bare, d_k=32 is NOT the wall; if full ~= nosoftmax, the
softmax is free (overlapped); the gap full-vs-bare prices the whole VPU
chain. Compare against tools/mxu_probe.py's square = 93 TFLOP/s
speed-of-light for this residency pattern.

Usage (real chip, one TPU process at a time):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/mha_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.DEFAULT
NEG_INF = -1.0e10


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PRECISION)


def _dot_qk(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PRECISION)


def _ln(x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def make_block(C=256, H=8, dk=32, d_ff=1024, T=640, with_softmax=True,
               with_mask=True, with_ln=True, with_relu=True,
               interpret=None):
    """One transformer block structurally identical to
    fused_transformer_block (whole-[Tp,Tp] logits live: T <= ~1k, the
    bench point's regime). Returns (fn, flops_per_batch_row)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rs = np.random.RandomState(0)

    def w(*shape):
        return jnp.asarray(rs.randn(*shape).astype(np.float32) * 0.03)

    qk, kk, vk = w(H, C, dk), w(H, C, dk), w(H, C, dk)
    ok = w(H, dk, C)
    ff1, ff2 = w(C, d_ff), w(d_ff, C)
    scale = float(dk) ** -0.5

    # per batch row: QKV 3*2*T*C*(H*dk); scores+AV 2 * 2*T*T*(H*dk);
    # out 2*T*(H*dk)*C; FFN 2 * 2*T*C*d_ff
    flops_row = (6 * T * C * H * dk + 4 * T * T * H * dk
                 + 2 * T * H * dk * C + 4 * T * C * d_ff)

    def kernel(x_ref, qk_r, kk_r, vk_r, ok_r, ff1_r, ff2_r, o_ref):
        xx = x_ref[0]                                   # [T, C]
        att = jnp.zeros((T, C), jnp.float32)
        for h in range(H):
            q = _dot(xx, qk_r[...][h]) * scale
            k = _dot(xx, kk_r[...][h])
            v = _dot(xx, vk_r[...][h])
            logits = _dot_qk(q, k)                      # [T, T]
            if with_mask:
                rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
                mt = (cols <= rows).astype(jnp.float32)
                logits = logits + NEG_INF * (1.0 - mt)
            if with_softmax:
                p = jax.nn.softmax(logits, axis=-1)
            else:
                p = logits * (1.0 / T)
            att = att + _dot(_dot(p, v), ok_r[...][h])
        x1 = xx + att
        if with_ln:
            x1 = _ln(x1)
        f = _dot(x1, ff1_r[...])
        if with_relu:
            f = jax.nn.relu(f)
        x2 = x1 + _dot(f, ff2_r[...])
        if with_ln:
            x2 = _ln(x2)
        o_ref[0] = x2

    w_specs, w_args = [], []
    for arr in (qk, kk, vk, ok, ff1, ff2):
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

    return fn, flops_row


def time_fn(fn, x, n_rep=10):
    y = fn(x)
    float(np.asarray(y[0, 0, 0]))  # force completion (block_until_ready
    t0 = time.perf_counter()       # is a no-op on this relay)
    for _ in range(n_rep):
        y = fn(x)
    float(np.asarray(y[0, 0, 0]))
    return (time.perf_counter() - t0) / n_rep


def main():
    # the bench point: bench_mhanet_rtf("fusedblock") runs B=128 rows of
    # 10 s audio = 625 frames -> Tp 640; 5 blocks (mhanet-1.1c)
    B, T, G = 128, 640, 5
    x = jnp.asarray(np.random.RandomState(1).randn(B, T, 256)
                    .astype(np.float32) * 0.1)
    cases = [
        ("full", dict()),
        ("nosoftmax", dict(with_softmax=False)),
        ("nomask", dict(with_mask=False)),
        ("bare", dict(with_softmax=False, with_mask=False, with_ln=False,
                      with_relu=False)),
        ("bare_dk64", dict(H=4, dk=64, with_softmax=False, with_mask=False,
                           with_ln=False, with_relu=False)),
        ("bare_dk128", dict(H=2, dk=128, with_softmax=False, with_mask=False,
                            with_ln=False, with_relu=False)),
        ("full_dk64", dict(H=4, dk=64)),
    ]
    out = {}
    for name, kw in cases:
        fn, fpr = make_block(T=T, **kw)

        def chain(x, f=fn):
            for _ in range(G):
                x = f(x)
            return x

        dt = time_fn(jax.jit(chain), x)
        tflops = G * fpr * B / dt / 1e12
        out[name] = {"ms": round(dt * 1e3, 3), "tflops": round(tflops, 2)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
