#!/usr/bin/env python3
"""Train the TPU-native RT-DETR detector.

CLI counterpart of ref: scripts/train_rtdetr.py:30-138 and the third-party
flow (scripts/train_rtdetr_thirdparty.py): same dataset/protocol defaults,
same artifact outputs — but the model, deformable attention, Hungarian loss
and training loop are all first-party (no subprocess, no CUDA third party).
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train RT-DETR (TPU-native).")
    p.add_argument(
        "--parquet",
        type=str,
        default=str(paths.ZODMOE_FRAMES_WITH_BOXES_AND_SOLAR_BINS_PARQUET),
    )
    p.add_argument("--splits-dir", type=str, default=str(paths.SPLITS_DIR))
    p.add_argument("--img-h", type=int, default=704)
    p.add_argument("--img-w", type=int, default=1248)
    p.add_argument("--epochs", type=int, default=72)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr0", type=float, default=1e-4)
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--num-queries", type=int, default=300)
    p.add_argument("--decoder-layers", type=int, default=6)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--project", type=str, default=str(paths.RUNS_DIR / "rtdetr"))
    p.add_argument("--name", type=str, default="baseline")
    p.add_argument("--unclear-policy", type=str, default="exclude_unclear")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--max-epochs-this-run", type=int, default=None,
        help="Pause (checkpoint + fit_progress.json) after N epochs in this "
        "process; re-invoke with --resume to continue. Long-run mitigation "
        "for the tunneled TPU client's per-transfer host-RAM leak.",
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
        action=argparse.BooleanOptionalAction,
        default=True,
        help="Rematerialize backbone blocks in the backward pass (trades "
        "~10%% recompute for multi-GB activation savings at protocol "
        "resolution; required headroom for batch 16 + resident data).",
    )
    return p.parse_args()


def main() -> None:
    args = parse_args()

    # Deadman for the tunneled TPU runtime (wedged RPCs hang forever;
    # exit 3 lets orchestration relaunch with --resume). MMOE_STALL_TIMEOUT_S
    # overrides; 0 disables. Grace covers restore + cold XLA compile.
    from multimodal_moe_tpu.utils import watchdog

    watchdog.enable(900.0, label="train_rtdetr", initial_grace_s=5400.0)

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
    from multimodal_moe_tpu.models.rtdetr import RTDETRDetector, rtdetr_loss
    from multimodal_moe_tpu.models.yolo import count_params
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

    from multimodal_moe_tpu.parallel.mesh import batch_sharding, create_mesh

    mesh = create_mesh()
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

    model = RTDETRDetector(
        num_classes=1,
        hidden_dim=args.hidden_dim,
        num_queries=args.num_queries,
        num_decoder_layers=args.decoder_layers,
        remat=args.remat,
    )
    cfg = DetTrainConfig(
        variant="r50vd",
        img_h=args.img_h,
        img_w=args.img_w,
        epochs=args.epochs,
        patience=args.patience,
        batch=args.batch,
        seed=args.seed,
        lr0=args.lr0,
        lrf=1.0,          # RT-DETR keeps a flat LR with AdamW
        optimizer="adamw",
        weight_decay=1e-4,
        warmup_epochs=1.0,
    )
    loss_fn = functools.partial(rtdetr_loss, img_hw=(args.img_h, args.img_w))
    trainer = DetectionTrainer(
        model, cfg, loss_fn=loss_fn, mesh=mesh, steps_per_epoch=len(train_loader)
    )

    # One jitted eval step for the whole run (rebuilding per epoch leaks
    # loaded executables in the tunnel client).
    infer_v = make_inference_step(model)

    def val_fn(state):
        variables = {"params": state.ema_params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return evaluate_detector(
            iter(val_loader),
            lambda images, context_ids=None: infer_v(variables, images, context_ids),
            use_nms=False,
            compute_curves=False,
        )

    # Written BEFORE training so interrupted runs stay evaluable.
    (run_dir / "model_config.json").write_text(
        json.dumps(
            {
                "family": "rtdetr",
                "variant": "r50vd",
                "num_classes": 1,
                "hidden_dim": args.hidden_dim,
                "num_queries": args.num_queries,
                "num_decoder_layers": args.decoder_layers,
                "optimizer": "adamw",
                "img_h": args.img_h,
                "img_w": args.img_w,
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
        model_name="rtdetr-r50vd",
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
        "model_family": "rtdetr",
        "model_variant": "r50vd",
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


if __name__ == "__main__":
    main()
