"""Worker for tests/test_distributed.py: one rank of a real 2-process
``jax.distributed`` run on the CPU backend.

Initializes through the framework's own entry point
(``maybe_initialize_distributed``), then proves the cluster is real:
a cross-process ``psum`` over the global 2-device mesh plus the
``loader_shard`` contract. Prints one JSON line the parent asserts on.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main() -> None:
    # Must be configured before the backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from multimodal_moe_tpu.parallel.distributed import (
        loader_shard,
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed() is True
    rank, world = loader_shard()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == world * len(jax.local_devices())
    mesh = Mesh(np.array(devs), ("d",))

    # Each process contributes (rank + 1); psum must see both.
    local = jnp.full((1,), float(rank + 1), jnp.float32)
    garr = jax.make_array_from_single_device_arrays(
        (world,), NamedSharding(mesh, P("d")), [local]
    )
    from jax import shard_map

    f = jax.jit(
        shard_map(
            lambda x: jax.lax.psum(x, "d"), mesh=mesh, in_specs=P("d"), out_specs=P()
        )
    )
    psum_val = float(np.asarray(f(garr).addressable_data(0))[0])

    # Loader sharding: disjoint strided slices of a 10-sample epoch.
    from multimodal_moe_tpu.data.pipeline import DetectionLoader

    class _Stub:
        def __len__(self):
            return 10

    loader = DetectionLoader.__new__(DetectionLoader)
    loader.dataset = _Stub()
    loader.process_index = rank
    loader.process_count = world
    indices = loader._indices_static().tolist()

    print(
        json.dumps(
            {"rank": rank, "world": world, "psum": psum_val, "indices": indices}
        )
    )


if __name__ == "__main__":
    main()
