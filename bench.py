"""Benchmark: real-time factor of the flagship enhancement pipeline on one
TPU chip.

Metric: seconds of audio enhanced per wall-clock second per chip (RTF), on
the full fused pipeline of the reference's inference path
(ref: deepxi/model.py:224-332): int16 wav -> normalise -> STFT -> ResNetV2
(resnet-1.1c topology, 40 dilated blocks, 1.95M params) -> DBNormalCDF
inverse -> MMSE-LSA gain -> iSTFT -> waveform, everything inside one jit.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
north-star target is >100x real time per chip, so vs_baseline = RTF / 100.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from deepxi_tpu import sig
    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.models import network_selector

    N_d, N_s, K, f_s = 512, 256, 512, 16000
    # Batch 32 saturates the chip (B=8: ~26k RTF, B=32: ~44k; bf16 compute
    # measured no faster than f32 at these shapes and costs accuracy).
    B, SECONDS = 32, 10.0
    n_samples = int(f_s * SECONDS)
    n_samples = (n_samples // N_s) * N_s  # static frame count

    it = inp_tgt_selector("MagXi", N_d=N_d, N_s=N_s, K=K, f_s=f_s,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(128, 257)) ** 2
              ).astype(np.float32) * 10 + 1e-3
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))

    net = network_selector("ResNetV2", 257, d_model=256, n_blocks=40, d_f=64,
                           k=3, max_d_rate=16, causal=True,
                           unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
    rng = np.random.RandomState(0)
    x_wav = (rng.randn(B, n_samples) * 3000).astype(np.int16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((B, n_samples // N_s, 257)))

    from deepxi_tpu.enhance import make_enhancer
    from deepxi_tpu.ops.kernels.tcn_fused import resnetv2_apply_fused

    # Fused Pallas TCN (multi-block groups resident in VMEM): 4.7 ms/batch
    # vs 6.8 ms with the XLA conv path at these shapes.
    fused_apply = lambda p, m: resnetv2_apply_fused(p, m, n_blocks=40,
                                                    max_d_rate=16)
    enhance = make_enhancer(it, net, "mmse-lsa", apply_fn=fused_apply)

    x_dev = jax.device_put(jnp.asarray(x_wav))
    # warmup / compile; a host read-back forces real completion (on this
    # TPU runtime block_until_ready returns before execution finishes)
    float(enhance(params, x_dev)[0, 0])

    n_rep = 20
    t0 = time.perf_counter()
    y = None
    for _ in range(n_rep):
        y = enhance(params, x_dev)
    # device stream is in-order: reading the last result back implies all
    # n_rep executions completed
    float(y[0, 0])
    dt = time.perf_counter() - t0

    audio_seconds = B * (n_samples / f_s) * n_rep
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "enhancement_rtf_resnet-1.1c",
        "value": round(rtf, 2),
        "unit": "audio_sec/wall_sec/chip",
        "vs_baseline": round(rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
