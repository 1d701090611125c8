#!/usr/bin/env python3
"""Evaluate a trained detector run and persist the uniform artifact schema.

CLI counterpart of ref: scripts/eval_detector.py:44-263: same flags
(--backend/--weights/--split/--img-h/--img-w/--batch/--run-name/--seed/
--unclear-policy), same outputs (metrics.json with derived fps keys,
metrics_table.csv, run_metadata.json/csv) under ``EVAL_DIR/<backend>/<run>/``.

``--weights`` points at a run directory produced by train_yolo/train_rtdetr
(containing ``weights/{best,last}`` + ``model_config.json``) or directly at
a checkpoint directory.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Evaluate detector run.")
    p.add_argument("--backend", choices=["yolo", "rtdetr", "moe"], default="yolo")
    p.add_argument(
        "--parquet",
        type=str,
        default=str(paths.ZODMOE_FRAMES_WITH_BOXES_AND_SOLAR_BINS_PARQUET),
    )
    p.add_argument("--splits-dir", type=str, default=str(paths.SPLITS_DIR))
    p.add_argument("--weights", type=str, required=True,
                   help="Run dir (with weights/best) or checkpoint dir.")
    p.add_argument("--checkpoint", choices=["best", "last"], default="best")
    p.add_argument("--split", choices=["train", "val", "test"], default="val")
    p.add_argument("--img-h", type=int, default=704)
    p.add_argument("--img-w", type=int, default=1248)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--run-name", type=str, default="yolo_eval")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--unclear-policy", type=str, default="exclude_unclear")
    p.add_argument("--nms-iou", type=float, default=0.7)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--use-ema", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument(
        "--int8", action="store_true",
        help="PTQ int8 serving path: calibrate on train batches, fold BN, "
        "quantize, eval the int8 forward (yolo/moe: full conv trunk; "
        "rtdetr: backbone + CCFF encoder convs, fp AIFI/decoder). The quant "
        "tree is cached as int8_quant.npz beside the checkpoint.",
    )
    p.add_argument("--int8-calib-batches", type=int, default=8)
    p.add_argument("--int8-recalibrate", action="store_true")
    p.add_argument(
        "--int8-fp-box", action="store_true",
        help="int8 serving with the DFL box-regression branch kept fp "
        "(yolo/moe): targets the strict-IoU PTQ loss the hard corpus "
        "exposed. The quant npz is still built/cached for the full-int8 "
        "model (superset), so both modes share one calibration.",
    )
    p.add_argument(
        "--int8-calib-mode", choices=("absmax", "avgmax"), default="absmax",
        help="Activation-scale statistic: absmax = running max over all "
        "calib batches (conservative); avgmax = mean of per-batch absmax "
        "(outlier-robust, finer resolution — see quant.calibrate).",
    )
    return p.parse_args()


def _resolve_ckpt(weights: Path, which: str) -> "tuple[Path, dict]":
    """Accept a run dir, a weights dir, or a checkpoint dir."""
    cfg = {}
    for probe in (weights, weights.parent, weights.parent.parent):
        mc = probe / "model_config.json"
        if mc.exists():
            cfg = json.loads(mc.read_text())
            break
    if (weights / "weights" / which).exists():
        return weights / "weights" / which, cfg
    if (weights / which).exists():
        return weights / which, cfg
    return weights, cfg


def main() -> None:
    args = parse_args()

    # Deadman for the tunneled TPU runtime (wedged RPCs hang forever;
    # exit 3 lets orchestration relaunch with --resume). MMOE_STALL_TIMEOUT_S
    # overrides; 0 disables. Grace covers restore + cold XLA compile.
    from multimodal_moe_tpu.utils import watchdog

    watchdog.enable(900.0, label="eval_detector", initial_grace_s=5400.0)
    from multimodal_moe_tpu.data.pipeline import (
        DetectionLoader,
        ZODMoEDataConfig,
        ZODMoEVisionDataset,
    )
    from multimodal_moe_tpu.models.yolo import YoloDetector, count_params
    from multimodal_moe_tpu.train.artifacts import (
        add_derived_speed_metrics,
        collect_runtime_info,
        infer_model_variant_from_weights,
        save_metrics_json,
        save_metrics_table_csv,
        save_run_metadata_artifacts,
    )
    from multimodal_moe_tpu.train.detection import DetTrainConfig, DetectionTrainer
    from multimodal_moe_tpu.train.evaluator import evaluate_detector, make_inference_fn
    from multimodal_moe_tpu.train.state import CheckpointManager

    ckpt_path, model_cfg = _resolve_ckpt(Path(args.weights).resolve(), args.checkpoint)
    variant = model_cfg.get("variant", "s")
    family = model_cfg.get("family", args.backend)

    if family == "moe":
        from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector

        model = MoEYoloDetector(
            num_classes=model_cfg.get("num_classes", 1),
            variant=variant,
            num_experts=model_cfg.get("num_experts", 4),
        )
    elif family == "yolo":
        model = YoloDetector(num_classes=model_cfg.get("num_classes", 1), variant=variant)
    else:
        from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

        model = RTDETRDetector(
            num_classes=model_cfg.get("num_classes", 1),
            hidden_dim=model_cfg.get("hidden_dim", 256),
            num_queries=model_cfg.get("num_queries", 300),
            num_decoder_layers=model_cfg.get("num_decoder_layers", 6),
        )

    cfg = DetTrainConfig(
        variant=variant, img_h=args.img_h, img_w=args.img_w,
        optimizer=model_cfg.get("optimizer", "sgd"),
    )
    trainer = DetectionTrainer(model, cfg, steps_per_epoch=1)
    state = trainer.init_state()
    ckpt = CheckpointManager(ckpt_path.parent)
    # opt_state-independent restore: eval must work regardless of which
    # optimizer chain trained the checkpoint (and even when the run was
    # interrupted before model_config.json recorded it).
    state = ckpt.restore_eval(ckpt_path.name, state)

    ds = ZODMoEVisionDataset(
        ZODMoEDataConfig(
            frames_parquet=args.parquet,
            split_csv=str(Path(args.splits_dir) / f"{args.split}_ids.csv"),
            img_h=args.img_h,
            img_w=args.img_w,
            unclear_policy=args.unclear_policy,
        )
    )
    loader = DetectionLoader(ds, batch_size=args.batch, drop_last=False)

    params = state.ema_params if args.use_ema else state.params
    variables = {"params": params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    fp_model, fp_variables = model, variables

    if args.int8:
        import numpy as np

        from multimodal_moe_tpu import quant as qz

        if family == "moe":
            from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector

            def _build_q(**extra):
                return MoEYoloDetector(
                    num_classes=model_cfg.get("num_classes", 1),
                    variant=variant,
                    num_experts=model_cfg.get("num_experts", 4),
                    int8=True, **extra,
                )
        elif family == "rtdetr":
            from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

            def _build_q(**extra):
                return RTDETRDetector(
                    num_classes=model_cfg.get("num_classes", 1),
                    hidden_dim=model_cfg.get("hidden_dim", 256),
                    num_queries=model_cfg.get("num_queries", 300),
                    num_decoder_layers=model_cfg.get("num_decoder_layers", 6),
                    int8=True,
                )
        else:

            def _build_q(**extra):
                return YoloDetector(
                    num_classes=model_cfg.get("num_classes", 1), variant=variant,
                    int8=True, **extra,
                )

        # calibration/npz always target the FULL int8 model; --int8-fp-box
        # only changes the serving model (its quant tree is a subset)
        model_q = _build_q()
        fp_box = args.int8_fp_box and family in ("moe", "yolo")
        qnpz = ckpt_path.parent / f"int8_quant_{ckpt_path.name}.npz"
        if qnpz.exists() and not args.int8_recalibrate:
            qvars = qz.load_quant_npz(qnpz)
            print(f"Loaded int8 quant tree <- {qnpz}")
        else:
            calib_ds = ZODMoEVisionDataset(
                ZODMoEDataConfig(
                    frames_parquet=args.parquet,
                    split_csv=str(Path(args.splits_dir) / "train_ids.csv"),
                    img_h=args.img_h,
                    img_w=args.img_w,
                    unclear_policy=args.unclear_policy,
                )
            )
            calib_loader = DetectionLoader(
                calib_ds, batch_size=args.batch, drop_last=True
            )
            calib = []
            for batch in calib_loader:
                calib.append(np.asarray(batch["image"]).astype(np.float32) / 255.0)
                if len(calib) >= args.int8_calib_batches:
                    break
            qvars = qz.quantize_detector(
                model, model_q, variables, calib, mode=args.int8_calib_mode
            )
            qz.save_quant_npz(qnpz, qvars)
            print(
                f"Calibrated on {len(calib)} train batches "
                f"({args.int8_calib_mode}); saved -> {qnpz}"
            )
        if family in ("moe", "rtdetr") or fp_box:
            # partially-quantized: fp blocks (MoE FFNs / DETR encoder+decoder
            # / the fp box branch) keep reading 'params' beside the int8
            # trunk's 'quant' tree
            qvars = qz.merge_serving_variables(qvars, variables)
        model = _build_q(int8_fp_box=True) if fp_box else model_q
        variables = qvars

    infer = make_inference_fn(model, variables)

    metrics = evaluate_detector(
        iter(loader),
        infer,
        iou_threshold=args.nms_iou,
        max_det=args.max_det,
        use_nms=(family != "rtdetr"),  # DETR family is NMS-free by design
    )
    metrics = add_derived_speed_metrics(metrics)
    metrics["params_total"] = count_params(params)
    from multimodal_moe_tpu.train.evaluator import model_flops_g

    # FLOPs reported for the fp graph (backend-independent analytic number;
    # the int8 graph's op mix is a serving detail, not a model property).
    metrics["flops_g"] = model_flops_g(fp_model, fp_variables, args.img_h, args.img_w)
    if args.int8:
        metrics["quantization"] = (
            "int8_w8a8_ptq_fp_box" if args.int8_fp_box else "int8_w8a8_ptq"
        )

    out_dir = Path(paths.EVAL_DIR) / args.backend / args.run_name
    out_dir.mkdir(parents=True, exist_ok=True)
    out_json = save_metrics_json(metrics, out_dir / "metrics.json")
    out_csv = save_metrics_table_csv(metrics, out_dir / "metrics_table.csv")

    metadata = {
        "model_family": family,
        "model_variant": variant or infer_model_variant_from_weights(str(ckpt_path)),
        "model_weights": str(ckpt_path),
        "run_name": args.run_name,
        "seed": int(args.seed),
        "split": args.split,
        "img_h": int(args.img_h),
        "img_w": int(args.img_w),
        "unclear_policy": args.unclear_policy,
        "dataset_export_name": Path(args.parquet).stem,
        "nms_iou": args.nms_iou,
        "max_det": args.max_det,
        "quantization": (
            ("int8_w8a8_ptq_fp_box" if args.int8_fp_box else "int8_w8a8_ptq")
            if args.int8 else "none"
        ),
    }
    metadata.update(collect_runtime_info())
    meta_json, meta_csv = save_run_metadata_artifacts(
        metadata, out_dir / "run_metadata.json", out_dir / "run_metadata.csv"
    )
    print(f"Saved metrics -> {out_json}")
    print(f"Saved table   -> {out_csv}")
    print(f"Saved run metadata -> {meta_json}")
    print(f"Saved metadata table -> {meta_csv}")


if __name__ == "__main__":
    main()
