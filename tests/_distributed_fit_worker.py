"""Worker for tests/test_distributed.py::test_two_process_fit: one rank of a
real 2-process ``jax.distributed`` TRAINING run on the CPU backend.

Runs the actual ``DetectionTrainer.fit`` loop (VERDICT r3 #7 — the
multi-host path every train CLI claims but which had never executed a
training step across processes): YOLO-n at tiny shapes, per-process data
shards assembled into global batches by ``prefetch_to_device``, collective
Orbax checkpoint writes with the rank-0 rename swap, then a ``resume=True``
continuation. Prints one JSON line the parent asserts on.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


class _TinyShardLoader:
    """Minimal loader contract for fit(): len() + iteration yielding numpy
    batch dicts. Holds this process's strided shard of an 8-sample dataset
    (the same disjoint-slice rule DetectionLoader uses)."""

    def __init__(self, rank: int, world: int, h: int = 64, w: int = 64):
        rng = np.random.default_rng(0)  # same global dataset on every rank
        n, m = 8, 4
        images = rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)
        boxes = np.zeros((n, m, 4), np.float32)
        boxes[:, 0] = [8, 8, 40, 56]
        mask = np.zeros((n, m), bool)
        mask[:, 0] = True
        self._idx = np.arange(n)[rank::world]
        self._data = dict(
            image=images,
            gt_boxes=boxes,
            gt_labels=np.zeros((n, m), np.int32),
            gt_mask=mask,
        )
        self.local_batch = 2

    def __len__(self):
        return len(self._idx) // self.local_batch

    def __iter__(self):
        for i in range(len(self)):
            sel = self._idx[i * self.local_batch : (i + 1) * self.local_batch]
            yield {k: v[sel] for k, v in self._data.items()}


def main() -> None:
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
    run_dir = os.environ["MMOE_TEST_RUN_DIR"]  # shared across both ranks

    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.train.detection import DetTrainConfig, DetectionTrainer

    import jax.numpy as jnp

    model = YoloDetector(num_classes=1, variant="n", dtype=jnp.float32)
    cfg = DetTrainConfig(
        variant="n", img_h=64, img_w=64, epochs=3, batch=4, seed=0,
        hsv_aug=False, hflip_prob=0.0, dtype="float32",
    )
    loader = _TinyShardLoader(rank, world)
    trainer = DetectionTrainer(model, cfg, steps_per_epoch=len(loader))

    # Phase 1: 2 of 3 epochs, then pause (the chunked-run path).
    state, summary1 = trainer.fit(
        loader, run_dir=run_dir, max_epochs_this_run=2, log_every=1
    )
    # Phase 2: resume from the collective checkpoint and finish epoch 3.
    trainer2 = DetectionTrainer(model, cfg, steps_per_epoch=len(loader))
    state2, summary2 = trainer2.fit(
        loader, run_dir=run_dir, resume=True, log_every=1
    )

    # Replicated-param checksum: identical across ranks iff the gradient
    # psum really synchronized the model.
    checksum = float(
        sum(float(np.asarray(jnp.sum(x))) for x in jax.tree.leaves(state2.params))
    )
    print(
        json.dumps(
            {
                "rank": rank,
                "world": world,
                "epochs_phase1": summary1["epochs_run"],
                "epochs_total": summary2["epochs_run"],
                "final_step": int(np.asarray(state2.step)),
                "param_checksum": checksum,
                "loss_last": float(summary2["history"][-1]["loss"]),
                "weights_exist": {
                    name: os.path.isdir(os.path.join(run_dir, "weights", name))
                    for name in ("last", "best")
                },
            }
        )
    )


if __name__ == "__main__":
    main()
