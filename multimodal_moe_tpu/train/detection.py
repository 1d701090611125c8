"""Detection trainer: jitted SPMD train step, epoch loop, best/last
checkpoints, artifact emission.

This is the first-party replacement for the training loops the reference
runs inside Ultralytics / RT-DETRv2 (SURVEY.md §3.2, §3.4). One trainer
serves every detector family — the model and its loss are injected — so the
artifact schema and checkpoint semantics stay identical across families,
exactly like the reference's shared serializers (ref: rtdetr.py:131-138).

SPMD: the step is one ``jax.jit`` over the ``(data, expert)`` mesh — batch
sharded on the data axis, state replicated (experts sharded where present);
XLA inserts the gradient ``psum`` over ICI.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.tal import yolo_loss
from ..parallel.mesh import batch_sharding, create_mesh, replicated
from ..utils import watchdog
from .state import CheckpointManager, TrainState, make_optimizer


@dataclass
class DetTrainConfig:
    """Training configuration; defaults follow the locked protocol
    (ref: notes/experiment_protocol_camera.md:23-52 — 1248×704, 50 epochs,
    batch 16, seed 0) and the reference CLI defaults (ref: scripts/train_yolo.py)."""

    variant: str = "s"
    num_classes: int = 1
    img_h: int = 704
    img_w: int = 1248
    epochs: int = 50
    patience: int = 100
    batch: int = 16
    seed: int = 0
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    optimizer: str = "sgd"
    dtype: str = "bfloat16"
    use_ema_for_eval: bool = True
    # Protocol-legal augmentation: photometric + horizontal flip only
    # (geometric augs stay zero, ref: notes/experiment_protocol_camera.md:33-37).
    hsv_aug: bool = True
    hflip_prob: float = 0.5


def _fitness(metrics: dict) -> float:
    """Model-selection scalar: 0.1·mAP50 + 0.9·mAP50-95 (the standard
    detector fitness used for best.pt selection)."""
    return 0.1 * metrics.get("map50", 0.0) + 0.9 * metrics.get("map50_95", 0.0)


class DetectionTrainer:
    def __init__(
        self,
        model,
        cfg: DetTrainConfig,
        *,
        loss_fn: Callable = yolo_loss,
        mesh=None,
        steps_per_epoch: Optional[int] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.loss_fn = loss_fn
        self.mesh = mesh if mesh is not None else create_mesh()
        self.steps_per_epoch = steps_per_epoch
        self._tx = None
        self._train_step = None

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        dummy = jnp.zeros((1, self.cfg.img_h, self.cfg.img_w, 3), jnp.float32)
        variables = jax.jit(
            lambda r: self.model.init(r, dummy, train=True)
        )(rng)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        total_steps = (self.steps_per_epoch or 100) * self.cfg.epochs
        warmup = int((self.steps_per_epoch or 100) * self.cfg.warmup_epochs)
        self._tx = make_optimizer(
            lr0=self.cfg.lr0,
            lrf=self.cfg.lrf,
            momentum=self.cfg.momentum,
            weight_decay=self.cfg.weight_decay,
            warmup_steps=warmup,
            total_steps=total_steps,
            optimizer=self.cfg.optimizer,
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self._tx.init(params),
            # A distinct buffer: ema aliasing params would make the donated
            # train-step input donate the same buffer twice.
            ema_params=jax.tree.map(jnp.copy, params),
        )
        state = jax.device_put(state, replicated(self.mesh))
        # Expert-stacked weights shard over the mesh's expert axis (no-op on
        # a 1-wide expert axis or for dense models).
        from ..parallel.mesh import EXPERT_AXIS, shard_params

        if self.mesh.shape[EXPERT_AXIS] > 1:
            state = state.replace(
                params=shard_params(state.params, self.mesh),
                ema_params=shard_params(state.ema_params, self.mesh),
            )
        return state

    # -- step ----------------------------------------------------------------
    def _build_train_step(self):
        model, loss_fn, tx = self.model, self.loss_fn, self._tx

        context_aware = getattr(model, "context_aware", False)
        denoising = getattr(model, "denoising_capable", False)
        base_rng = jax.random.PRNGKey(self.cfg.seed + 7919)

        cfg = self.cfg

        def step_fn(state: TrainState, batch) -> "tuple[TrainState, Dict]":
            images = batch["image"].astype(jnp.float32) / 255.0
            gt_boxes = batch["gt_boxes"]
            if cfg.hsv_aug or cfg.hflip_prob > 0:
                from ..ops.augment import train_augment

                aug_rng = jax.random.fold_in(base_rng, state.step)
                images, gt_boxes = train_augment(
                    images, gt_boxes, aug_rng,
                    hsv=cfg.hsv_aug, hflip_prob=cfg.hflip_prob,
                )
            batch = dict(batch, gt_boxes=gt_boxes)
            extra = {}
            rngs = {}
            if context_aware and "solar_bin" in batch:
                extra["context_ids"] = batch["solar_bin"]
            if denoising:
                extra["gt_boxes"] = batch["gt_boxes"]
                extra["gt_mask"] = batch["gt_mask"]
                rngs["denoise"] = jax.random.fold_in(base_rng, state.step + 1_000_003)

            def compute_loss(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                outputs, mutated = model.apply(
                    variables,
                    images,
                    train=True,
                    mutable=["batch_stats"] if state.batch_stats else [],
                    rngs=rngs or None,
                    **extra,
                )
                total, metrics = loss_fn(
                    outputs, batch["gt_labels"], batch["gt_boxes"], batch["gt_mask"]
                )
                new_stats = mutated.get("batch_stats", state.batch_stats)
                return total, (metrics, new_stats)

            (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads, tx, new_stats)
            return new_state, metrics

        # State shardings are inferred from the arrays' placement (replicated
        # by default; expert-stacked MoE weights stay sharded over the expert
        # axis when the caller placed them there via shard_params) — pinning
        # them replicated here would silently undo expert parallelism.
        return jax.jit(
            step_fn,
            in_shardings=(None, batch_sharding(self.mesh)),
            donate_argnums=(0,),
        )

    def train_step(self, state, batch):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        # Activate the mesh so bare-PartitionSpec sharding constraints inside
        # model code (parallel.mesh.constrain — e.g. the MoE sweep's
        # expert-parallel mid layout) resolve against it at trace time.
        with jax.sharding.set_mesh(self.mesh):
            return self._train_step(state, batch)

    # -- loop ----------------------------------------------------------------
    def fit(
        self,
        train_loader,
        *,
        run_dir: "str | Path",
        val_fn: Optional[Callable[[TrainState], dict]] = None,
        log_every: int = 50,
        state: Optional[TrainState] = None,
        resume: bool = False,
        max_epochs_this_run: Optional[int] = None,
    ) -> "tuple[TrainState, dict]":
        cfg = self.cfg
        run_dir = Path(run_dir)
        self.steps_per_epoch = self.steps_per_epoch or len(train_loader)
        ckpt = CheckpointManager(run_dir / "weights")
        # Multi-process: checkpoint saves are collective (every rank calls
        # them, Orbax coordinates); plain-file artifacts (fit_progress.json)
        # and console logs come from process 0 only. Decision state (best
        # fitness, early stop) derives from replicated metrics, so every
        # rank takes identical branches without communication.
        is_lead = jax.process_index() == 0

        if state is None:
            state = self.init_state()

        # Cross-process-resumable progress: epoch counter, best fitness,
        # early-stop counter and history persist beside the checkpoints so
        # an interrupted (or deliberately chunked) run continues exactly
        # where it stopped — needed on hosts where long runs must restart
        # periodically (the tunneled TPU client leaks host RAM per H2D
        # transfer; see docs/performance.md).
        progress_path = run_dir / "fit_progress.json"
        t_start = time.perf_counter()
        best_fitness = -float("inf")
        epochs_without_improvement = 0
        history = []
        start_epoch = 0
        wall_accum = 0.0
        if resume and not ckpt.has("last") and progress_path.exists():
            # Restarting here would train from scratch and, worse, overwrite
            # weights/best with early-epoch weights the moment the (reset)
            # best-fitness bar is cleared — observed in production when a
            # crash-destroyed ``last`` met an old fit_progress.json. Refuse.
            prog_epoch = json.loads(progress_path.read_text()).get("epoch")
            raise RuntimeError(
                f"--resume for {run_dir}: fit_progress.json records epoch "
                f"{prog_epoch} but weights/last is missing. Refusing to "
                "silently restart (it would overwrite weights/best). Restore "
                "the checkpoint, or delete fit_progress.json to deliberately "
                "start over."
            )
        if resume and ckpt.has("last"):
            state = ckpt.restore("last", state)
            if progress_path.exists():
                prog = json.loads(progress_path.read_text())
                start_epoch = int(prog["epoch"]) + 1
                best_fitness = float(prog["best_fitness"])
                epochs_without_improvement = int(prog["epochs_without_improvement"])
                history = list(prog.get("history", []))
                wall_accum = float(prog.get("train_wall_s_accum", 0.0))

        epochs_this_run = 0
        stopped_early = False
        for epoch in range(start_epoch, cfg.epochs):
            epoch_metrics: "Dict[str, list]" = {}
            from ..data.pipeline import prefetch_to_device

            # Device→host metric fetches are synchronization points; batch
            # them every ``log_every`` steps instead of per step so training
            # on a healthy host isn't serialized by the logging. (log_every=1
            # restores per-step sync — useful on the tunneled runtime where
            # deep device queues poison interleaved H2D transfers.)
            fetch_every = max(1, int(log_every))
            pending: "list[Dict]" = []

            def _flush():
                for md in pending:
                    host = jax.device_get(md)
                    for k, v in host.items():
                        epoch_metrics.setdefault(k, []).append(float(v))
                pending.clear()
                # A completed device_get proves the device round-trip is
                # alive — heartbeat for the tunnel-wedge deadman.
                watchdog.beat(f"train epoch {epoch}")

            for batch in prefetch_to_device(
                iter(train_loader), sharding=batch_sharding(self.mesh)
            ):
                batch = {
                    k: v
                    for k, v in batch.items()
                    if k in ("image", "gt_boxes", "gt_labels", "gt_mask", "solar_bin")
                }
                state, metrics = self.train_step(state, batch)
                pending.append(metrics)
                if len(pending) >= fetch_every:
                    _flush()
            _flush()

            row = {k: float(np.mean(v)) for k, v in epoch_metrics.items()}
            row["epoch"] = epoch

            if val_fn is not None:
                val_metrics = val_fn(state)
                row.update({f"val_{k}": v for k, v in val_metrics.items()
                            if isinstance(v, (int, float))})
                fit = _fitness(val_metrics)
            else:
                fit = -float(row.get("loss", np.inf))

            history.append(row)
            ckpt.save_last(state)
            watchdog.beat(f"checkpoint epoch {epoch}")
            if fit > best_fitness:
                best_fitness = fit
                ckpt.save_best(state)
                epochs_without_improvement = 0
            else:
                epochs_without_improvement += 1
            if is_lead:
                print(
                    f"epoch {epoch + 1}/{cfg.epochs} "
                    + " ".join(f"{k}={v:.4f}" for k, v in row.items() if k != "epoch")
                )
                progress_path.write_text(json.dumps({
                    "epoch": epoch,
                    "best_fitness": best_fitness,
                    "epochs_without_improvement": epochs_without_improvement,
                    "train_wall_s_accum": wall_accum + (time.perf_counter() - t_start),
                    "history": history,
                }))
            epochs_this_run += 1
            if epochs_without_improvement > cfg.patience:
                if is_lead:
                    print(f"Early stopping at epoch {epoch + 1} (patience {cfg.patience}).")
                stopped_early = True
                break
            if max_epochs_this_run and epochs_this_run >= max_epochs_this_run:
                if is_lead:
                    print(
                        f"Pausing after {epochs_this_run} epochs this run "
                        f"(resume with --resume to continue)."
                    )
                break

        wall = wall_accum + (time.perf_counter() - t_start)
        summary = {
            "train_wall_time_s": wall,
            "best_fitness": best_fitness,
            "epochs_run": len(history),
            "history": history,
            "stopped_early": stopped_early,
            "completed": stopped_early or len(history) >= cfg.epochs,
        }
        return state, summary
