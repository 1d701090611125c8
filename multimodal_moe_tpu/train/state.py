"""Train state + optimizer construction + EMA + Orbax checkpointing.

Checkpoint semantics mirror what the reference delegates to
Ultralytics/RT-DETRv2 — ``best``/``last`` snapshots plus resume
(ref: rtdetr_thirdparty.py:235-236, eval_detector.py:66-69; SURVEY.md §5.4)
— implemented with Orbax.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any

    def apply_gradients(self, grads, tx: optax.GradientTransformation, new_batch_stats):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        # EMA with warmup ramp (matches the detector-training convention of a
        # decay that eases in over the first ~2k steps).
        step = self.step + 1
        decay = 0.9999 * (1.0 - jnp.exp(-step.astype(jnp.float32) / 2000.0))
        new_ema = jax.tree.map(
            lambda e, p: e * decay + p * (1.0 - decay), self.ema_params, new_params
        )
        return self.replace(
            step=step,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


def make_optimizer(
    *,
    lr0: float = 0.01,
    lrf: float = 0.01,
    momentum: float = 0.937,
    weight_decay: float = 5e-4,
    warmup_steps: int = 1000,
    total_steps: int = 10000,
    optimizer: str = "sgd",
    grad_clip_norm: Optional[float] = 10.0,
) -> optax.GradientTransformation:
    """Optimizer chain mirroring the locked protocol's Ultralytics 'auto'
    settings (ref: notes/experiment_protocol_camera.md:40-52): warmup then
    linear decay lr0 → lr0·lrf, SGD+momentum (or AdamW), decoupled weight
    decay, global-norm clipping."""
    warmup_steps = max(1, min(warmup_steps, max(total_steps - 1, 1)))
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr0, warmup_steps),
            optax.linear_schedule(lr0, lr0 * lrf, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if optimizer == "sgd":
        parts += [
            optax.add_decayed_weights(weight_decay, mask=_decay_mask),
            optax.sgd(schedule, momentum=momentum, nesterov=True),
        ]
    elif optimizer == "adamw":
        parts.append(
            optax.adamw(schedule, weight_decay=weight_decay, mask=_decay_mask)
        )
    else:
        raise ValueError(f"unknown optimizer: {optimizer}")
    return optax.chain(*parts)


def _decay_mask(params):
    """Decay only matmul/conv kernels — never biases or norm scales."""

    def mask_leaf(path, leaf):
        keys = jax.tree_util.keystr(path)
        return ("kernel" in keys) and leaf.ndim > 1

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


# ---------------------------------------------------------------------------
# Orbax best/last checkpointing
# ---------------------------------------------------------------------------

class CheckpointManager:
    """best/last checkpoints with resume (Orbax under the hood).

    Multi-process safe: every process must call ``save``/``restore``/``has``
    in the same order (Orbax writes are collective — each process persists
    its addressable shards); the filesystem bookkeeping around them (stale
    cleanup, the crash-safe rename swap, recovery) runs on process 0 only,
    fenced with global barriers so no rank races ahead of the swap.
    """

    def __init__(self, run_dir: "str | Path"):
        import orbax.checkpoint as ocp

        self.run_dir = Path(run_dir).resolve()
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> Path:
        return self.run_dir / name

    @staticmethod
    def _is_lead() -> bool:
        return jax.process_index() == 0

    @staticmethod
    def _sync(tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def save(self, name: str, state: TrainState) -> Path:
        """Crash-safe save: write to a sibling ``<name>.new`` dir, then swap.

        Orbax's ``force=True`` deletes the destination *before* writing its
        replacement, so a process killed mid-save (host OOM, chunk-timeout
        SIGTERM) destroys the only copy of ``last`` — after which a
        ``--resume`` finds no checkpoint. The swap shrinks the
        no-checkpoint window from the full multi-second write to two
        directory renames, and ``_recover`` repairs even that window.
        """
        import shutil

        path = self._path(name)
        new = self._path(name + ".new")
        old = self._path(name + ".old")
        if self._is_lead():
            for stale in (new, old):
                if stale.exists():
                    shutil.rmtree(stale)
        self._sync(f"ckpt-pre-{name}")
        self._ckptr.save(new, state, force=True)
        self._ckptr.wait_until_finished()
        self._sync(f"ckpt-written-{name}")
        if self._is_lead():
            if path.exists():
                path.rename(old)
            new.rename(path)
            if old.exists():
                shutil.rmtree(old)
        self._sync(f"ckpt-swapped-{name}")
        return path

    def _recover(self, name: str) -> None:
        """If a crash landed between the two swap renames (``<name>``
        missing but a fully-written ``<name>.new`` present — orbax only
        renames its ``*.orbax-checkpoint-tmp`` staging dir to ``<name>.new``
        once the write completed), finish the swap."""
        path, new = self._path(name), self._path(name + ".new")
        if self._is_lead() and not path.exists() and new.exists():
            new.rename(path)
        self._sync(f"ckpt-recover-{name}")

    def save_last(self, state: TrainState) -> Path:
        return self.save("last", state)

    def save_best(self, state: TrainState) -> Path:
        return self.save("best", state)

    def restore(self, name: str, target: TrainState) -> TrainState:
        self._recover(name)
        return self._ckptr.restore(self._path(name), target=target)

    def restore_eval(self, name: str, target: TrainState) -> TrainState:
        """Restore only the inference-relevant leaves (params / ema_params /
        batch_stats), ignoring the optimizer state entirely.

        Evaluation must not depend on reconstructing the *training-time*
        optimizer chain: a checkpoint written by an AdamW run would fail a
        structural restore against an evaluator that guessed SGD (opt_state
        pytrees differ). Raw-restore the checkpoint and graft the weight
        trees onto the target state."""
        self._recover(name)
        raw = self._ckptr.restore(self._path(name))
        out = target
        for field in ("params", "ema_params", "batch_stats"):
            val = raw.get(field) if isinstance(raw, dict) else None
            if val:
                out = out.replace(**{field: val})
        return out

    def has(self, name: str) -> bool:
        self._recover(name)
        return self._path(name).exists()
