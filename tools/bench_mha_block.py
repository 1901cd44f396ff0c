"""Interleaved A/B bench: fused-attention vs fully-fused-block MHANet.

Compares bench.py's mhanet enhancement pipeline with per-op fused
attention ("fused": flash kernel + XLA LN/FFN) against the whole
transformer block in one Pallas kernel ("fusedblock",
ops/kernels/mha_block_fused.py), alternating rounds for fairness, plus
a parity check on the first rows.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_mha_block.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N_s, f_s = 256, 16000


def main(B=128, seconds=10.0, rounds=7, reps=6) -> int:
    from bench import _mag_xi
    from deepxi_tpu.enhance import make_enhancer
    from deepxi_tpu.models import network_selector
    from deepxi_tpu.ops.kernels.mha_block_fused import mhanetv3_apply_fused

    n = int(f_s * seconds) // N_s * N_s
    it = _mag_xi(1)
    net = network_selector("MHANetV3", 257, d_model=256, n_blocks=5,
                           n_heads=8, causal=True, outp_act="Sigmoid",
                           max_len=2048, attention_impl="fused", block_q=256)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 257)))
    apply_fb = lambda p, m: mhanetv3_apply_fused(
        p, m, n_blocks=5, n_heads=8, d_model=256, max_len=2048)
    enh = {
        "fused": jax.jit(make_enhancer(it, net, "mmse-lsa",
                                       precision="default")),
        "fusedblock": jax.jit(make_enhancer(it, net, "mmse-lsa",
                                            apply_fn=apply_fb,
                                            precision="default")),
    }
    x = jax.device_put(jnp.asarray(
        (np.random.RandomState(1).randn(B, n) * 3000).astype(np.int16)))

    ys = {}
    for name, fn in enh.items():
        y = fn(params, x)
        ys[name] = np.asarray(y[:2].astype(jnp.float32))
    dev = float(np.max(np.abs(ys["fused"] - ys["fusedblock"])))
    print(f"parity max|dy| = {dev:.3e} (int16-scale wav)", flush=True)

    times = {"fused": [], "fusedblock": []}
    for r in range(rounds):
        order = ("fused", "fusedblock") if r % 2 == 0 else ("fusedblock",
                                                           "fused")
        for name in order:
            fn = enh[name]
            y = fn(params, x)
            float(y[0, 0])
            t0 = time.perf_counter()
            for _ in range(reps):
                y = fn(params, x)
            float(y[0, 0])
            dt = (time.perf_counter() - t0) / reps
            times[name].append(dt)
            print(f"round {r} {name}: {dt*1e3:.2f} ms "
                  f"(rtf {B*(n/f_s)/dt:,.0f})", flush=True)
    ma, mb = np.median(times["fused"]), np.median(times["fusedblock"])
    print(f"median fused {ma*1e3:.2f} ms  fusedblock {mb*1e3:.2f} ms  "
          f"ratio {ma/mb:.3f}x  rtf fused {B*(n/f_s)/ma:,.0f} "
          f"fusedblock {B*(n/f_s)/mb:,.0f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
