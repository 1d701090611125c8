#!/usr/bin/env python3
"""Train the context-routed MoE detector (the framework's flagship model —
the detector the reference repo was building toward; BASELINE.json configs
4-5, ref design notes: notes/related_work.md:44-130).

Same data/protocol defaults and artifact outputs as train_yolo; adds MoE
knobs (experts, top-k, capacity) and expert-parallel mesh support.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train context-routed MoE detector.")
    p.add_argument("--variant", type=str, default="s", help="trunk size n/s/m/l")
    p.add_argument(
        "--parquet",
        type=str,
        default=str(paths.ZODMOE_FRAMES_WITH_BOXES_AND_SOLAR_BINS_PARQUET),
    )
    p.add_argument("--splits-dir", type=str, default=str(paths.SPLITS_DIR))
    p.add_argument("--img-h", type=int, default=704)
    p.add_argument("--img-w", type=int, default=1248)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr0", type=float, default=0.01)
    p.add_argument("--num-experts", type=int, default=4)
    p.add_argument("--top-k", type=int, default=2)
    p.add_argument("--capacity-factor", type=float, default=1.25)
    p.add_argument("--expert-parallel", type=int, default=1,
                   help="devices on the mesh expert axis")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--project", type=str, default=str(paths.RUNS_DIR / "moe"))
    p.add_argument("--name", type=str, default="baseline")
    p.add_argument("--unclear-policy", type=str, default="exclude_unclear")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--max-epochs-this-run", type=int, default=None,
        help="Pause (checkpoint + fit_progress.json) after N epochs in this "
        "process; re-invoke with --resume to continue.",
    )
    p.add_argument("--max-boxes", type=int, default=96)
    p.add_argument(
        "--resident",
        action="store_true",
        help="Device-resident dataset (HBM-parked YUV420 planes, in-graph "
        "batch gather) — see data/resident.py.",
    )
    p.add_argument(
        "--stream-store", type=str, default="auto",
        choices=("auto", "rgb", "yuv420"),
        help="Streaming-loader pixel path: 'yuv420' decodes natively to raw "
        "4:2:0 planes (GIL-free, half the H2D bytes, finished on device); "
        "'auto' probes the corpus and falls back to PIL RGB. Ignored with "
        "--resident.",
    )
    p.add_argument(
        "--remat",
        action="store_true",
        help="Rematerialize backbone+neck stages on the backward pass "
        "(jax.checkpoint): ~25-30%% more fwd FLOPs for a multi-GB activation "
        "saving — lets larger variants train at protocol batch alongside the "
        "HBM-resident store. Checkpoint-compatible with non-remat runs.",
    )
    return p.parse_args()


def main() -> None:
    args = parse_args()

    # Deadman for the tunneled TPU runtime (wedged RPCs hang forever;
    # exit 3 lets orchestration relaunch with --resume). MMOE_STALL_TIMEOUT_S
    # overrides; 0 disables. Grace covers restore + cold XLA compile.
    from multimodal_moe_tpu.utils import watchdog

    watchdog.enable(900.0, label="train_moe", initial_grace_s=5400.0)

    # Multi-host entry: no-op single-host (SURVEY.md §5.8 TPU-native design).
    from multimodal_moe_tpu.parallel.distributed import (
        loader_shard,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    proc_idx, proc_count = loader_shard()
    from multimodal_moe_tpu.data.pipeline import (
        DetectionLoader,
        ZODMoEDataConfig,
        ZODMoEVisionDataset,
    )
    from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector, moe_yolo_loss
    from multimodal_moe_tpu.models.yolo import count_params
    from multimodal_moe_tpu.parallel.mesh import create_mesh
    from multimodal_moe_tpu.train.artifacts import (
        collect_runtime_info,
        save_metrics_json,
        save_run_metadata_artifacts,
        save_training_summary,
    )
    from multimodal_moe_tpu.train.detection import DetTrainConfig, DetectionTrainer
    from multimodal_moe_tpu.train.evaluator import evaluate_detector, make_inference_step

    run_dir = Path(args.project) / args.name
    run_dir.mkdir(parents=True, exist_ok=True)
    splits_dir = Path(args.splits_dir)

    def make_ds(split):
        return ZODMoEVisionDataset(
            ZODMoEDataConfig(
                frames_parquet=args.parquet,
                split_csv=str(splits_dir / f"{split}_ids.csv"),
                img_h=args.img_h,
                img_w=args.img_w,
                max_boxes=args.max_boxes,
                unclear_policy=args.unclear_policy,
            )
        )

    from multimodal_moe_tpu.parallel.mesh import batch_sharding

    mesh = create_mesh(num_expert=args.expert_parallel)
    loader_kw = {}
    if args.resident:
        from multimodal_moe_tpu.data.resident import ResidentDetectionLoader as _Loader

        loader_kw["sharding"] = batch_sharding(mesh)
    else:
        _Loader = DetectionLoader
        loader_kw["store"] = args.stream_store
    train_loader = _Loader(
        make_ds("train"), batch_size=args.batch, shuffle=True,
        seed=args.seed, num_workers=args.workers,
        process_index=proc_idx, process_count=proc_count, **loader_kw,
    )
    val_loader = _Loader(
        make_ds("val"), batch_size=args.batch, drop_last=False,
        num_workers=args.workers, **loader_kw,
    )

    model = MoEYoloDetector(
        num_classes=1,
        variant=args.variant,
        num_experts=args.num_experts,
        k=args.top_k,
        capacity_factor=args.capacity_factor,
        remat=args.remat,
    )
    cfg = DetTrainConfig(
        variant=args.variant,
        img_h=args.img_h,
        img_w=args.img_w,
        epochs=args.epochs,
        patience=args.patience,
        batch=args.batch,
        seed=args.seed,
        lr0=args.lr0,
    )
    trainer = DetectionTrainer(
        model, cfg, loss_fn=moe_yolo_loss, mesh=mesh,
        steps_per_epoch=len(train_loader),
    )

    infer_v = make_inference_step(model)  # one jitted eval step per run

    def val_fn(state):
        variables = {"params": state.ema_params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return evaluate_detector(
            iter(val_loader),
            lambda images, context_ids=None: infer_v(variables, images, context_ids),
            compute_curves=False,
        )

    # Record the *effective* dispatch per MoE level: "auto" thresholds are
    # measured crossovers that may move between versions, and eval numerics
    # differ across modes (capacity-sparse drops tokens, sweep/gmm are
    # dropless) — old-vs-new comparisons must see which mode actually ran.
    from multimodal_moe_tpu.models.moe import resolve_dispatch

    effective = {
        f"P{3 + i}": resolve_dispatch(
            "auto",
            args.batch * (args.img_h // s) * (args.img_w // s),
            args.num_experts,
        )
        for i, s in enumerate((8, 16, 32))
    }
    (run_dir / "model_config.json").write_text(
        json.dumps(
            {
                "family": "moe",
                "variant": args.variant,
                "num_classes": 1,
                "num_experts": args.num_experts,
                "top_k": args.top_k,
                "optimizer": "sgd",
                "img_h": args.img_h,
                "img_w": args.img_w,
                "dispatch": "auto",
                "effective_dispatch_at_train_batch": effective,
            },
            indent=2,
        )
    )
    t0 = time.perf_counter()
    state, summary = trainer.fit(
        train_loader, run_dir=run_dir, val_fn=val_fn, resume=args.resume,
        max_epochs_this_run=args.max_epochs_this_run,
    )
    wall = time.perf_counter() - t0

    n_params = count_params(state.params)
    save_training_summary(
        train_wall_time_s=wall,
        model_name=f"moe-yolo-{args.variant}-e{args.num_experts}",
        data_yaml=args.parquet,
        run_name=args.name,
        out_json_path=run_dir / "train_summary.json",
        out_csv_path=run_dir / "train_summary.csv",
        params_total=n_params,
        params_trainable=n_params,
        extra={"epochs_run": summary["epochs_run"], "best_fitness": summary["best_fitness"]},
    )
    if summary["history"]:
        last = summary["history"][-1]
        save_metrics_json(
            {k: v for k, v in last.items() if isinstance(v, (int, float))},
            run_dir / "train_metrics.json",
        )
    metadata = {
        "model_family": "moe",
        "model_variant": f"{args.variant}-e{args.num_experts}k{args.top_k}",
        "run_name": args.name,
        "seed": args.seed,
        "img_h": args.img_h,
        "img_w": args.img_w,
        "unclear_policy": args.unclear_policy,
        "parquet": str(args.parquet),
        "epochs": args.epochs,
        "batch": args.batch,
        "num_experts": args.num_experts,
        "expert_parallel": args.expert_parallel,
    }
    metadata.update(collect_runtime_info())
    save_run_metadata_artifacts(
        metadata, run_dir / "run_metadata.json", run_dir / "run_metadata.csv"
    )
    print(f"Run artifacts -> {run_dir}")


if __name__ == "__main__":
    main()
