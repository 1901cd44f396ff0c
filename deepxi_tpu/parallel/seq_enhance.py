"""Sequence-parallel enhancement: shard the TIME axis of long audio over
the device mesh (TPU-native; no reference equivalent -- SURVEY.md section 2f
records the reference has no multi-device machinery at all).

Data-parallel batching (parallel/mesh.py) covers throughput; this covers a
different production case: one very long recording (broadcast archives,
meeting captures) that should finish in 1/N the wall-clock of a single
chip. The causal TCN family makes that exact: a frame's output depends on
at most `receptive_field_frames` past frames, so each device enhances its
time shard after receiving that much left context from its neighbour over
ICI (one `ppermute`), and the concatenated result is bit-identical to the
offline single-device pipeline (tests/test_seq_enhance.py). Halo compute is
recomputation, not communication: for the flagship net the halo is 497
frames (~8 s), negligible against hour-scale shards.

Attention models attend over their whole past, so they have no finite halo;
`make_seq_sharded_enhancer` is TCN-only by construction.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepxi_tpu.models.tcn import cyclic_dilation
from deepxi_tpu.parallel.mesh import DATA_AXIS


def receptive_field_frames(n_blocks: int, max_d_rate: int, k: int = 3) -> int:
    """Causal receptive field of the ResNet TCN stack in FRAMES: the output
    at frame t reads frames [t - R + 1, t] where R = 1 + sum block reaches
    (ref topology: deepxi/network/tcn.py:116-225)."""
    return 1 + sum((k - 1) * cyclic_dilation(i, max_d_rate)
                   for i in range(n_blocks))


def make_seq_sharded_enhancer(inp_tgt, network, gtype: str = "mmse-lsa",
                              mesh: Optional[Mesh] = None,
                              halo_frames: Optional[int] = None,
                              n_blocks: int = 40, max_d_rate: int = 16,
                              k: int = 3,
                              precision: str = "highest",
                              apply_fn: Optional[Callable] = None) -> Callable:
    """Build `enhance(params, x_int16[n]) -> y_float[n]` sharding time over
    the mesh's "data" axis.

    Args:
      halo_frames: left-context frames each shard recomputes; defaults to
        the stack's exact receptive field (from n_blocks/max_d_rate/k).
      apply_fn: optional fused network apply (e.g. resnetv2_apply_fused).

    The input is padded to a multiple of n_shards * N_s; the output is the
    enhanced waveform trimmed back to the input length. Each device runs
    the same fused single-jit pipeline as `deepxi_tpu.enhance` on
    [halo + shard] samples and emits only its shard's hop rows, so
    numerics match the offline path exactly (same frames, same context).
    """
    from jax import shard_map

    from deepxi_tpu.enhance import make_enhancer

    if mesh is None:
        raise ValueError("a mesh is required")
    # TCN-only by construction (finite causal receptive field); an
    # attention/RNN net would silently produce wrong shard boundaries
    name = type(network).__name__
    if name not in ("ResNet", "ResNetV2", "ResNetV3"):
        raise ValueError(
            f"sequence sharding needs a finite-receptive-field causal TCN "
            f"(ResNet family), got {name}; attention attends over its whole "
            f"past and has no finite halo")
    if not getattr(network, "causal", False):
        raise ValueError("sequence sharding requires a causal network")
    N_s = inp_tgt.N_s
    n_sh = mesh.shape[DATA_AXIS]
    if halo_frames is None:
        halo_frames = receptive_field_frames(n_blocks, max_d_rate, k)
    halo = halo_frames * N_s

    # the per-shard pipeline is the standard fused enhancer (shape [1, L])
    core = make_enhancer(inp_tgt, network, gtype, precision=precision,
                         apply_fn=apply_fn)

    right = inp_tgt.N_d - N_s  # a frame reads N_d samples per N_s hop

    def shard_body(params, x_sh):
        """x_sh: [1, L_shard] int16 on one device."""
        # left halo (receptive field) from the previous device over ICI;
        # device 0 gets zeros (start of audio == the offline pipeline's
        # implicit zero history)
        left_h = jax.lax.ppermute(x_sh[:, -halo:], DATA_AXIS,
                                  [(i, i + 1) for i in range(n_sh - 1)])
        # right halo (one frame's overhang, N_d - N_s samples) from the next
        # device: the shard's LAST frame spans into its neighbour's first
        # samples under pad_end framing; the last device gets zeros, exactly
        # the offline pipeline's pad_end zeros
        right_h = jax.lax.ppermute(x_sh[:, :right], DATA_AXIS,
                                   [(i + 1, i) for i in range(n_sh - 1)])
        xw = jnp.concatenate([left_h, x_sh, right_h], axis=1)
        y = core(params, xw)
        # core emits (T+1)*N_s samples; this shard's hop rows start after
        # the halo_frames halo hops
        return y[:, halo: halo + x_sh.shape[1]]

    @jax.jit
    def enhance(params, x):
        n = x.shape[-1]
        chunk = n_sh * N_s
        n_pad = -(-n // chunk) * chunk
        if n_pad // n_sh < halo:
            raise ValueError(
                f"input of {n} samples gives {n_pad // n_sh}-sample shards, "
                f"shorter than the {halo}-sample halo (receptive field "
                f"{halo_frames} frames); sequence sharding needs long audio "
                f"-- use the batch path for short utterances")
        if n_pad != n:
            x = jnp.pad(x, (0, n_pad - n))
        xs = x.reshape(1, n_pad)
        sharded = shard_map(
            functools.partial(shard_body),
            mesh=mesh,
            in_specs=(P(), P(None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS),
        )
        xs = jax.lax.with_sharding_constraint(
            xs, NamedSharding(mesh, P(None, DATA_AXIS)))
        y = sharded(params, xs)[0]
        # The recording's first halo_frames hops: device 0's zero-sample
        # halo is NOT the same as the offline stack's layer-wise
        # zero-activation padding (zero samples still produce bias/LN
        # activations), so those head frames are recomputed with a tiny
        # replicated offline pass over the prefix and spliced in -- after
        # which the sharded result is exactly the offline pipeline's.
        head = core(params, x[None, : halo + right])[0, :halo]
        y = jnp.concatenate([head, y[halo:]])
        return y[:n]

    return enhance
