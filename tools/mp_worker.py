"""Multi-process data-parallel worker: one fused train step on a global
("data", "model") mesh spanning N processes (CPU collectives via gloo).

Executes the multi-host layer (`deepxi_tpu/parallel/distributed.py`) for
real: every process must be started with the same coordinator address,
e.g. for a 2-process run:

    python tools/mp_worker.py --num_processes 2 --process_id 0 \
        --coordinator 127.0.0.1:12431 --out /tmp/mp0.json &
    python tools/mp_worker.py --num_processes 2 --process_id 1 \
        --coordinator 127.0.0.1:12431 &

Spawned by tests/test_parallel.py::TestMultiProcess, which asserts the
global loss and updated parameters match a single-process run bit-for-bit
(the SURVEY.md section-2f DCN-spanning data-parallel design; the reference
has no multi-process machinery of any kind).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default="127.0.0.1:12431")
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--platform", default="cpu",
                    help="set BEFORE any backend use (env vars are too "
                         "late under the axon sitecustomize)")
    ap.add_argument("--out", default=None,
                    help="JSON result path (written by process 0)")
    ap.add_argument("--network", default="resnet",
                    choices=("resnet", "mhanet"),
                    help="mhanet runs the attention flagship's semantics "
                         "(MHANetV3 + Transformer-schedule optimizer, the "
                         "reference's 'MHA' branch, deepxi/model.py:194-200)")
    a = ap.parse_args(argv)

    jax.config.update("jax_platforms", a.platform)
    if a.platform == "cpu":
        # one device per process: collectives must actually cross process
        # boundaries (a parent test env may export a virtual-device count)
        jax.config.update("jax_num_cpu_devices", 1)

    from deepxi_tpu.parallel.distributed import init_distributed, is_primary

    if a.num_processes > 1:
        init_distributed(coordinator_address=a.coordinator,
                         num_processes=a.num_processes,
                         process_id=a.process_id)
        assert jax.process_count() == a.num_processes, jax.process_count()

    import numpy as np
    import jax.numpy as jnp

    from deepxi_tpu.inp_tgt import inp_tgt_selector
    from deepxi_tpu.models import network_selector
    from deepxi_tpu.parallel import batch_sharding, make_mesh, shard_params
    from deepxi_tpu.training import TrainState, make_optimizer, make_train_step

    # deterministic tiny MagXi + ResNetV2 setup (mirrors
    # tests/test_parallel.py::test_data_parallel_train_step)
    it = inp_tgt_selector("MagXi", N_d=512, N_s=256, K=512, f_s=16000,
                          map_type="DBNormalCDF", map_params=None)
    sample = (np.abs(np.random.RandomState(0).randn(64, 257)) ** 2).astype(np.float32)
    it = it.replace(xi_map=it.xi_map.with_stats(jnp.asarray(sample)))
    if a.network == "mhanet":
        net = network_selector("MHANetV3", 257, d_model=32, n_blocks=2,
                               n_heads=4, causal=True, outp_act="Sigmoid",
                               max_len=64)
        tx = make_optimizer("MHANetV3", 32, 100)
    else:
        net = network_selector("ResNetV2", 257, d_model=32, n_blocks=2, d_f=16,
                               k=3, max_d_rate=2, causal=True,
                               unit_type="ReLU->LN->W+b", outp_act="Sigmoid")
        tx = make_optimizer("ResNetV2")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 257)))

    mesh = make_mesh()  # "data" axis spans every device of every process
    params = shard_params(mesh, params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(net, it, tx))

    # identical global batch on every process; each process materialises
    # only its addressable shards
    rng = np.random.RandomState(1)
    B = 8
    s = (rng.randn(B, 4096) * 3000).astype(np.int16)
    d = (rng.randn(B, 8192) * 1000).astype(np.int16)
    s_len = np.full(B, 4096, np.int32)
    d_len = np.full(B, 8192, np.int32)
    snr = np.linspace(0.0, 15.0, B).astype(np.float32)

    bsh = batch_sharding(mesh)

    def globalize(arr):
        return jax.make_array_from_callback(
            arr.shape, bsh, lambda idx: arr[idx])

    batch = tuple(globalize(x) for x in (s, d))
    key = jax.random.PRNGKey(2)
    state2, metrics = step(state, key, batch[0], batch[1],
                           jnp.asarray(s_len), jnp.asarray(d_len),
                           jnp.asarray(snr))

    checksum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(leaf))
                      for leaf in jax.tree_util.tree_leaves(p)))(state2.params)
    result = {
        "num_processes": jax.process_count(),
        "num_devices": jax.device_count(),
        "loss": float(metrics["loss"]),
        "param_checksum": float(checksum),
    }
    print(f"proc {a.process_id}: {result}", flush=True)
    if a.out and is_primary():
        with open(a.out, "w") as f:
            json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
