"""Interleaved A/B bench of the tap-stacked dilated conv in the fused TCN.

Measures the flagship enhancement pipeline (B=96 x 10 s, as bench.py's
headline) with `stack_taps` off vs on in alternating rounds (single-run
TPU benches here swing with relay jitter; interleaving is the only fair
protocol -- see round-2 negative results). Prints per-round times and the
median ratio; exits 0 either way (the result decides the default).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_stack_taps.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N_d, N_s, K, f_s = 512, 256, 512, 16000


def main(B=96, seconds=10.0, rounds=7, reps=8) -> int:
    from bench import _mag_xi
    from deepxi_tpu.enhance import make_enhancer
    from deepxi_tpu.models import network_selector
    from deepxi_tpu.ops.kernels.tcn_fused import resnetv2_apply_fused

    n = int(f_s * seconds) // N_s * N_s
    it = _mag_xi()
    net = network_selector("ResNetV2", 257, d_model=256, n_blocks=40, d_f=64,
                           k=3, max_d_rate=16, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((B, n // N_s, 257)))

    def mk(stack):
        apply_fn = lambda p, m: resnetv2_apply_fused(
            p, m, n_blocks=40, max_d_rate=16, stack_taps=stack)
        return jax.jit(make_enhancer(it, net, "mmse-lsa", apply_fn=apply_fn,
                                     precision="default"))

    enh = {"base": mk(False), "stack": mk(True)}
    x = jax.device_put(jnp.asarray(
        (np.random.RandomState(0).randn(B, n) * 3000).astype(np.int16)))

    # compile + parity check (identical up to f32 accumulation order)
    ys = {}
    for name, fn in enh.items():
        y = fn(params, x)
        ys[name] = np.asarray(y[:2].astype(jnp.float32))
    dev = float(np.max(np.abs(ys["base"] - ys["stack"])))
    print(f"parity max|dy| = {dev:.3e} (int16-scale wav)", flush=True)

    times = {"base": [], "stack": []}
    for r in range(rounds):
        for name in ("base", "stack") if r % 2 == 0 else ("stack", "base"):
            fn = enh[name]
            y = fn(params, x)
            float(y[0, 0])  # sync
            t0 = time.perf_counter()
            for _ in range(reps):
                y = fn(params, x)
            float(y[0, 0])
            dt = (time.perf_counter() - t0) / reps
            times[name].append(dt)
            print(f"round {r} {name}: {dt*1e3:.2f} ms "
                  f"(rtf {B*(n/f_s)/dt:,.0f})", flush=True)
    mb, ms = np.median(times["base"]), np.median(times["stack"])
    print(f"median base {mb*1e3:.2f} ms  stack {ms*1e3:.2f} ms  "
          f"ratio {mb/ms:.3f}x  "
          f"rtf base {B*(n/f_s)/mb:,.0f} stack {B*(n/f_s)/ms:,.0f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
