"""Multi-host distributed initialisation (TPU-native; no reference
equivalent -- SURVEY.md section 2f records the reference has no multi-device
machinery of any kind).

On a multi-host TPU pod, call `init_distributed()` once per process before
any jax usage; the ("data", "model") mesh from `parallel.mesh.make_mesh`
then spans all hosts, with the "data" axis laid out so gradient psums ride
ICI within a slice and only data-parallel reductions cross DCN.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed; arguments are auto-detected on TPU pods
    when omitted. No-op when running single-process.

    Explicit multi-host arguments make failures fatal; only the
    auto-detection path may fall back to single-process, and it logs why
    (a silently-degraded multi-host run was a catalogued round-1 hazard).
    """
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process (CPU/single-chip) envs
            logger.info("jax.distributed auto-init unavailable, running "
                        "single-process: %s", e)
            return
    else:
        # explicit multi-host configuration: let any failure propagate
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
