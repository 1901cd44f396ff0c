"""Ahead-of-time serving exports: serialize the fused wav->wav enhancer to
StableHLO artifacts that load and run WITHOUT any model code or Python
re-trace (jax.export). No reference equivalent -- the reference serves by
rebuilding the Keras graph from source + SavedModel weights every time
(ref: deepxi/model.py:267-332); here a deployment ships one artifact per
bucket shape with the weights baked in as constants.

Layout under ``out_dir``::

    manifest.json                 {"ver", "gain", "batch", "buckets",
                                   "platforms", "f_s"}
    enhancer_L<L>.stablehlo       serialized jax.export artifact,
                                  x:int16[batch, L] -> float32[batch, out]

`load_server` returns a callable that buckets/pads incoming batches and
dispatches to the right artifact -- the inference-serving analogue of
framework._fast_enhancer.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def export_enhancer(inp_tgt, network, params, out_dir: str,
                    gain: str = "mmse-lsa", batch: int = 32,
                    buckets: Sequence[int] = (8192, 16384, 32768, 65536,
                                              131072, 262144),
                    precision: str = "highest",
                    apply_fn: Optional[Callable] = None,
                    mesh=None, ver: str = "model") -> list:
    """Export the fused enhancement pipeline at each bucket length.

    Weights are closed over, so each artifact is self-contained. Returns
    the list of written paths. Artifacts bind to the exporting platform
    (cpu/tpu) -- export on the deployment target.

    With ``mesh`` (a jax.sharding.Mesh), the export is MULTI-CHIP: the
    batch axis shards over the mesh's "data" axis and the artifact records
    the shardings (jax.export carries them); serving then needs the same
    device count, and ``load_server(..., mesh=...)`` places inputs.
    """
    from jax import export as jexport

    from deepxi_tpu.enhance import make_enhancer

    enhance = make_enhancer(inp_tgt, network, gain, precision=precision,
                            apply_fn=apply_fn)
    n_devices = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from deepxi_tpu.parallel.mesh import DATA_AXIS
        sh = NamedSharding(mesh, P(DATA_AXIS))
        n_devices = mesh.size
        if batch % mesh.shape[DATA_AXIS]:
            raise ValueError(f"batch {batch} must divide over the "
                             f"{mesh.shape[DATA_AXIS]}-way data axis")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for L in buckets:
        if mesh is None:
            fn = jax.jit(lambda x: enhance(params, x))
        else:
            fn = jax.jit(lambda x: enhance(params, x),
                         in_shardings=sh, out_shardings=sh)
        exp = jexport.export(fn)(
            jax.ShapeDtypeStruct((batch, int(L)), jnp.int16))
        path = os.path.join(out_dir, f"enhancer_L{int(L)}.stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        written.append(path)
    manifest = {"ver": ver, "gain": gain, "batch": batch,
                "buckets": [int(b) for b in buckets],
                "platforms": [str(p) for p in exp.platforms],
                "n_devices": n_devices,
                "f_s": int(inp_tgt.f_s), "N_s": int(inp_tgt.N_s)}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return written


class EnhancerServer:
    """Loaded export bundle: call with int16 [B, n] (B <= batch), get the
    enhanced float waveform [B, n'] trimmed to the per-utterance iSTFT
    length convention of the offline driver."""

    def __init__(self, out_dir: str, mesh=None):
        from jax import export as jexport

        with open(os.path.join(out_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.batch = int(self.manifest["batch"])
        self.N_s = int(self.manifest["N_s"])
        n_dev = int(self.manifest.get("n_devices", 1))
        self._sharding = None
        if n_dev > 1:
            if mesh is None or mesh.size != n_dev:
                raise ValueError(
                    f"bundle was exported for {n_dev} devices; pass a mesh "
                    f"of that size to load_server(..., mesh=...)")
            from jax.sharding import NamedSharding, PartitionSpec as P
            from deepxi_tpu.parallel.mesh import DATA_AXIS
            self._sharding = NamedSharding(mesh, P(DATA_AXIS))
        self._fns = {}
        for L in self.manifest["buckets"]:
            p = os.path.join(out_dir, f"enhancer_L{L}.stablehlo")
            with open(p, "rb") as f:
                self._fns[int(L)] = jexport.deserialize(f.read())

    def bucket_for(self, n: int) -> int:
        for L in sorted(self._fns):
            if n <= L:
                return L
        raise ValueError(f"input of {n} samples exceeds the largest "
                         f"exported bucket ({max(self._fns)})")

    def __call__(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.int16)
        B, n = x.shape
        if B > self.batch:
            raise ValueError(f"batch {B} > exported batch {self.batch}")
        L = self.bucket_for(n)
        xp = np.zeros((self.batch, L), np.int16)
        xp[:B, :n] = x
        xj = jnp.asarray(xp)
        if self._sharding is not None:
            xj = jax.device_put(xj, self._sharding)
        y = np.asarray(self._fns[L].call(xj))
        n_frames = -(-n // self.N_s)
        return y[:B, : (n_frames + 1) * self.N_s]


def load_server(out_dir: str, mesh=None) -> EnhancerServer:
    return EnhancerServer(out_dir, mesh=mesh)


def export_streaming(sm, out_dir: str, batch: int = 64,
                     hop_batch: int = 1, ver: str = "model") -> list:
    """Export a real-time streaming step as self-contained StableHLO.

    ``sm`` is a `streaming.StreamingEnhancer` or `streaming.StreamingMHANet`
    (weights closed over). Two artifacts are written:

        stream_init.stablehlo   () -> zeroed stream state for ``batch``
                                (a flat tuple of arrays)
        stream_step.stablehlo   (state, int16[batch, hop_batch*N_s])
                                -> (state, float32[batch, hop_batch*N_s])

    ``hop_batch > 1`` exports the chunked `step_block` (MHANet only):
    H hops per dispatch, H x 16 ms added latency, ~H x stream capacity
    (see bench.bench_streaming_mha_capacity_chunked). The serving loop is
    just ``state, y = step.call(state, chunk)`` — state stays on device,
    no model code or re-trace at load time. No reference equivalent (the
    reference cannot stream at all; ref: deepxi/model.py:286 whole-utterance
    predict).
    """
    from jax import export as jexport

    step_fn = sm.step
    if hop_batch > 1:
        if not hasattr(sm, "step_block"):
            raise ValueError("hop_batch > 1 needs a chunked step_block "
                             "(StreamingMHANet)")
        step_fn = sm.step_block

    os.makedirs(out_dir, exist_ok=True)
    # The state crosses the artifact boundary as a FLAT tuple of arrays so
    # the loading side needs no pytree registrations (no model code).
    state0 = sm.init_state(batch)
    treedef = jax.tree.structure(state0)
    flat_sds = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                     for a in jax.tree.leaves(state0))
    chunk_sds = jax.ShapeDtypeStruct((batch, hop_batch * sm.N_s), jnp.int16)

    def init_flat():
        return tuple(jax.tree.leaves(sm.init_state(batch)))

    def step_flat(flat, chunk):
        st, y = step_fn(jax.tree.unflatten(treedef, flat), chunk)
        return tuple(jax.tree.leaves(st)), y

    exp_init = jexport.export(jax.jit(init_flat))()
    exp_step = jexport.export(jax.jit(step_flat))(flat_sds, chunk_sds)
    paths = []
    for name, exp in (("stream_init", exp_init), ("stream_step", exp_step)):
        p = os.path.join(out_dir, f"{name}.stablehlo")
        with open(p, "wb") as f:
            f.write(exp.serialize())
        paths.append(p)
    manifest = {"ver": ver, "kind": "streaming", "batch": batch,
                "hop_batch": hop_batch, "N_s": int(sm.N_s),
                "platforms": [str(p) for p in exp_step.platforms]}
    with open(os.path.join(out_dir, "stream_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return paths


class StreamingServer:
    """Loaded streaming bundle: ``init_state()`` then repeated
    ``state, y = server.step(state, chunk)`` — chunk is int16
    [B, hop_batch*N_s], output is the enhanced float hop(s)."""

    def __init__(self, out_dir: str):
        from jax import export as jexport

        with open(os.path.join(out_dir, "stream_manifest.json")) as f:
            self.manifest = json.load(f)
        self.batch = int(self.manifest["batch"])
        self.hop_batch = int(self.manifest["hop_batch"])
        self.N_s = int(self.manifest["N_s"])
        with open(os.path.join(out_dir, "stream_init.stablehlo"), "rb") as f:
            self._init = jexport.deserialize(f.read())
        with open(os.path.join(out_dir, "stream_step.stablehlo"), "rb") as f:
            self._step = jexport.deserialize(f.read())

    def init_state(self):
        return self._init.call()

    def step(self, state, chunk):
        return self._step.call(state, jnp.asarray(chunk, jnp.int16))


def load_streaming_server(out_dir: str) -> StreamingServer:
    return StreamingServer(out_dir)
