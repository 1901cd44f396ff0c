"""Multi-host distributed initialisation (TPU-native; no reference
equivalent -- SURVEY.md section 2f records the reference has no multi-device
machinery of any kind).

On a multi-host TPU pod, call `init_distributed()` once per process before
any jax usage; the ("data", "model") mesh from `parallel.mesh.make_mesh`
then spans all hosts, with the "data" axis laid out so gradient psums ride
ICI within a slice and only data-parallel reductions cross DCN.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed; arguments are auto-detected on TPU pods
    when omitted. No-op when running single-process."""
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception:
            # single-process (CPU/single-chip) environments
            return
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def is_primary() -> bool:
    """True on the process that should write artifacts/logs."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-sharded batch."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
