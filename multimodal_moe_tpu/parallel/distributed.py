"""Multi-host entry point.

The reference has no distributed code at all (SURVEY.md §2c/§5.8 — NCCL is
an inert transitive dep); this is the TPU-native replacement: one
``jax.distributed.initialize()`` call shared by every train CLI, a strict
no-op on a single host so the CLIs behave identically there.

Multi-host mode is selected by environment variables (the idiom of TPU pod
launchers, where every host runs the same command):

* ``MMOE_COORDINATOR_ADDRESS`` (or ``JAX_COORDINATOR_ADDRESS``) —
  ``host:port`` of process 0
* ``MMOE_NUM_PROCESSES`` / ``MMOE_PROCESS_ID`` (or the ``JAX_*`` variants) —
  explicit world size / rank; optional on TPU pods where the runtime
  provides them

Data loading composes with this through ``DetectionLoader``'s
``process_index``/``process_count`` arguments (disjoint strided slices of an
identically-shuffled epoch order) — see :func:`loader_shard`.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

_initialized = False


def _env_int(*names: str) -> Optional[int]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return int(v)
    return None


def maybe_initialize_distributed(
    *,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` when a multi-host launch is requested;
    no-op (returns False) on a plain single-host run.

    Call before any other jax API in a train CLI. Safe to call twice.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = (
        coordinator_address
        or os.environ.get("MMOE_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if num_processes is None:
        num_processes = _env_int("MMOE_NUM_PROCESSES", "JAX_NUM_PROCESSES")
    if process_id is None:
        process_id = _env_int("MMOE_PROCESS_ID", "JAX_PROCESS_ID")

    if coordinator_address is None and not (num_processes and num_processes > 1):
        return False  # single-host: nothing to do

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def loader_shard() -> "Tuple[int, int]":
    """(process_index, process_count) for ``DetectionLoader`` host sharding.

    Works before and after :func:`maybe_initialize_distributed`; on a
    single host it is always ``(0, 1)``.
    """
    import jax

    return jax.process_index(), jax.process_count()
