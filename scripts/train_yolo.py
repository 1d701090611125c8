#!/usr/bin/env python3
"""Train the TPU-native YOLO detector.

CLI counterpart of ref: scripts/train_yolo.py:30-191 — same defaults
(704×1248, epochs 50, patience 100, batch 16, seed 0) and the same artifact
outputs (train_summary.json/csv, train_metrics.json, run_metadata.json/csv),
but the training loop is the first-party SPMD trainer instead of an
Ultralytics subprocess. Data comes straight from the canonical parquet +
split CSVs (no intermediate export needed on the training path).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train YOLO detector (TPU-native).")
    p.add_argument("--model", type=str, default="yolo-s", help="yolo-{n,s,m,l}")
    p.add_argument(
        "--parquet",
        type=str,
        default=str(paths.ZODMOE_FRAMES_WITH_BOXES_AND_SOLAR_BINS_PARQUET),
    )
    p.add_argument("--splits-dir", type=str, default=str(paths.SPLITS_DIR))
    p.add_argument(
        "--data-yaml",
        type=str,
        default=None,
        help="Train from an exported Ultralytics-layout dataset.yaml instead "
        "of the parquet index (the reference CLI's primary input, "
        "ref: scripts/train_yolo.py).",
    )
    p.add_argument("--img-h", type=int, default=704)
    p.add_argument("--img-w", type=int, default=1248)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr0", type=float, default=0.01)
    p.add_argument("--lrf", type=float, default=0.01)
    p.add_argument("--optimizer", choices=["sgd", "adamw"], default="sgd")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--project", type=str, default=str(paths.RUNS_DIR / "yolo"))
    p.add_argument("--name", type=str, default="baseline")
    p.add_argument("--unclear-policy", type=str, default="exclude_unclear")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--max-epochs-this-run", type=int, default=None,
        help="Pause (checkpoint + fit_progress.json) after N epochs in this "
        "process; re-invoke with --resume to continue.",
    )
    p.add_argument("--max-boxes", type=int, default=96)
    p.add_argument("--eval-every", type=int, default=1, help="Val every N epochs.")
    p.add_argument(
        "--resident",
        action="store_true",
        help="Park the dataset in device HBM once (YUV420 planes) and gather "
        "batches in-graph — removes all per-epoch host decode + H2D traffic "
        "(data/resident.py; requires a pre-resized corpus).",
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

    watchdog.enable(900.0, label="train_yolo", initial_grace_s=5400.0)
    variant = args.model.split("-")[-1]

    # Multi-host entry: no-op single-host; on a pod every host runs this CLI
    # and shards the train loader below (SURVEY.md §5.8 TPU-native design).
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
    from multimodal_moe_tpu.models.yolo import YoloDetector, count_params
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

    def make_ds(split: str):
        if args.data_yaml:
            from multimodal_moe_tpu.data.yolo_layout import (
                YoloLayoutConfig,
                YoloLayoutDataset,
            )

            return YoloLayoutDataset(
                YoloLayoutConfig(
                    dataset_yaml=args.data_yaml,
                    split=split,
                    img_h=args.img_h,
                    img_w=args.img_w,
                    max_boxes=args.max_boxes,
                )
            )
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

    from multimodal_moe_tpu.parallel.mesh import batch_sharding, create_mesh

    mesh = create_mesh()
    if args.resident:
        from multimodal_moe_tpu.data.resident import ResidentDetectionLoader

        train_loader = ResidentDetectionLoader(
            make_ds("train"), batch_size=args.batch, shuffle=True,
            seed=args.seed, num_workers=args.workers,
            process_index=proc_idx, process_count=proc_count,
            sharding=batch_sharding(mesh),
        )
        val_loader = ResidentDetectionLoader(
            make_ds("val"), batch_size=args.batch, drop_last=False,
            num_workers=args.workers, sharding=batch_sharding(mesh),
        )
    else:
        train_loader = DetectionLoader(
            make_ds("train"), batch_size=args.batch, shuffle=True,
            seed=args.seed, num_workers=args.workers,
            process_index=proc_idx, process_count=proc_count,
            store=args.stream_store,
        )
        val_loader = DetectionLoader(
            make_ds("val"), batch_size=args.batch, drop_last=False,
            num_workers=args.workers, store=args.stream_store,
        )

    model = YoloDetector(num_classes=1, variant=variant, remat=args.remat)
    cfg = DetTrainConfig(
        variant=variant,
        img_h=args.img_h,
        img_w=args.img_w,
        epochs=args.epochs,
        patience=args.patience,
        batch=args.batch,
        seed=args.seed,
        lr0=args.lr0,
        lrf=args.lrf,
        optimizer=args.optimizer,
    )
    trainer = DetectionTrainer(model, cfg, mesh=mesh, steps_per_epoch=len(train_loader))

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

    # model_config.json lets eval_detector rebuild the exact model
    # (written before training so interrupted runs stay evaluable).
    (run_dir / "model_config.json").write_text(
        json.dumps(
            {
                "family": "yolo",
                "variant": variant,
                "num_classes": 1,
                "optimizer": args.optimizer,
                "img_h": args.img_h,
                "img_w": args.img_w,
            },
            indent=2,
        )
    )

    t0 = time.perf_counter()
    state, summary = trainer.fit(
        train_loader,
        run_dir=run_dir,
        val_fn=val_fn if args.eval_every > 0 else None,
        resume=args.resume,
        max_epochs_this_run=args.max_epochs_this_run,
    )
    wall = time.perf_counter() - t0

    n_params = count_params(state.params)
    save_training_summary(
        train_wall_time_s=wall,
        model_name=args.model,
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
        "model_family": "yolo",
        "model_variant": variant,
        "run_name": args.name,
        "seed": args.seed,
        "img_h": args.img_h,
        "img_w": args.img_w,
        "unclear_policy": args.unclear_policy,
        "parquet": str(args.parquet),
        "epochs": args.epochs,
        "batch": args.batch,
    }
    metadata.update(collect_runtime_info())
    save_run_metadata_artifacts(
        metadata, run_dir / "run_metadata.json", run_dir / "run_metadata.csv"
    )
    print(f"Run artifacts -> {run_dir}")
    print(f"Weights -> {run_dir / 'weights' / 'best'} (and .../last)")


if __name__ == "__main__":
    main()
