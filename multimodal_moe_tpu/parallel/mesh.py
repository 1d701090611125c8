"""Device mesh + sharding rules.

The reference has no distributed code at all (SURVEY.md §2c — single GPU
``device="0"`` everywhere); this is the net-new SPMD design:

* mesh axes ``("data", "expert")`` — data parallelism rides ICI via the
  gradient ``psum`` XLA inserts; the MoE layer shards its expert dimension
  over ``expert`` and dispatches with ``all_to_all``
* batches shard over ``data`` (and ``expert`` jointly when the expert axis
  is >1 — every device holds a batch slice; expert layers re-shard
  activations internally)
* parameters are replicated by default; MoE expert weights are sharded over
  ``expert``

Everything goes through ``jax.jit`` with ``NamedSharding`` constraints (the
pjit path) — XLA chooses the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def create_mesh(
    num_data: Optional[int] = None,
    num_expert: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(data, expert)`` mesh over the available devices.

    With ``num_data=None`` the data axis absorbs all devices not claimed by
    the expert axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_data is None:
        if n % num_expert:
            raise ValueError(f"{n} devices not divisible by expert={num_expert}")
        num_data = n // num_expert
    if num_data * num_expert != n:
        raise ValueError(
            f"mesh {num_data}x{num_expert} != {n} devices"
        )
    arr = np.asarray(devices).reshape(num_data, num_expert)
    return Mesh(arr, axis_names=(DATA_AXIS, EXPERT_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading dim over every mesh axis (full DP)."""
    return NamedSharding(mesh, P((DATA_AXIS, EXPERT_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def expert_sharding(mesh: Mesh) -> NamedSharding:
    """MoE expert-stacked weights: leading (expert) dim over the expert axis."""
    return NamedSharding(mesh, P(EXPERT_AXIS))


def constrain(x, *spec):
    """``with_sharding_constraint(x, P(*spec))`` iff a concrete mesh carrying
    every named axis in ``spec`` is active (``jax.sharding.set_mesh`` — the
    trainer enters it around the jitted step); no-op otherwise.

    Model code uses this to pin intermediate shardings GSPMD can't infer —
    e.g. the MoE sweep's (E, T, h) mid tensor, where tokens arrive sharded
    over BOTH mesh axes but expert weights claim the expert axis: without a
    constraint the partitioner falls back to "involuntary full
    rematerialization" (replicate-then-reshard) on the hot path.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty:
        return x
    names = set(am.axis_names)
    for s in spec:
        for axis in (s if isinstance(s, tuple) else (s,)):
            if axis is not None and axis not in names:
                return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_params(params, mesh: Mesh, expert_path_token: str = "experts"):
    """Place a param pytree: replicate everything except expert-stacked
    leaves (path containing ``expert_path_token``), which shard over the
    expert axis."""
    rep = replicated(mesh)
    exp = expert_sharding(mesh)

    def place(path, leaf):
        keys = jax.tree_util.keystr(path)
        sh = exp if expert_path_token in keys and mesh.shape[EXPERT_AXIS] > 1 else rep
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, params)
