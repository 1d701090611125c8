#!/usr/bin/env python3
"""Convert a trained detector run to the int8 PTQ serving format.

Standalone converter for serving workflows (eval_detector --int8 performs
the same conversion inline and caches it): calibrates activation scales on
train-split batches, folds BN, quantizes weights per-channel, and writes
``int8_quant_<ckpt>.npz`` beside the checkpoint. Covers all three families
(the family is read from model_config.json: yolo full conv trunk; moe
trunk + w8a8 expert sweep; rtdetr backbone + CCFF encoder convs with fp
AIFI/decoder). Serving-path design and error
budget: multimodal_moe_tpu/quant.py. No reference counterpart — the
reference serves through Ultralytics fp16 CUDA with no quantized
deployment story.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths


def main() -> None:
    p = argparse.ArgumentParser(description="PTQ int8 conversion for a YOLO run.")
    p.add_argument("--weights", type=str, required=True,
                   help="Run dir (with weights/best) or checkpoint dir.")
    p.add_argument("--checkpoint", choices=["best", "last"], default="best")
    p.add_argument(
        "--parquet", type=str,
        default=str(paths.ZODMOE_FRAMES_WITH_BOXES_AND_SOLAR_BINS_PARQUET),
    )
    p.add_argument("--splits-dir", type=str, default=str(paths.SPLITS_DIR))
    p.add_argument("--img-h", type=int, default=704)
    p.add_argument("--img-w", type=int, default=1248)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--calib-batches", type=int, default=8)
    p.add_argument("--use-ema", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--out", type=str, default=None,
                   help="Output npz (default: int8_quant_<ckpt>.npz beside it).")
    args = p.parse_args()

    import numpy as np

    from multimodal_moe_tpu import quant as qz
    from multimodal_moe_tpu.data.pipeline import (
        DetectionLoader,
        ZODMoEDataConfig,
        ZODMoEVisionDataset,
    )
    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.train.detection import DetTrainConfig, DetectionTrainer
    from multimodal_moe_tpu.train.state import CheckpointManager

    weights = Path(args.weights).resolve()
    cfg_json = {}
    for probe in (weights, weights.parent, weights.parent.parent):
        mc = probe / "model_config.json"
        if mc.exists():
            cfg_json = json.loads(mc.read_text())
            break
    ckpt_path = (
        weights / "weights" / args.checkpoint
        if (weights / "weights" / args.checkpoint).exists()
        else weights
    )
    variant = cfg_json.get("variant", "s")
    num_classes = cfg_json.get("num_classes", 1)
    family = cfg_json.get("family", "yolo")

    if family == "moe":
        from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector

        mk = lambda **kw: MoEYoloDetector(
            num_classes=num_classes, variant=variant,
            num_experts=cfg_json.get("num_experts", 4), **kw,
        )
    elif family == "rtdetr":
        from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

        mk = lambda **kw: RTDETRDetector(
            num_classes=num_classes,
            hidden_dim=cfg_json.get("hidden_dim", 256),
            num_queries=cfg_json.get("num_queries", 300),
            num_decoder_layers=cfg_json.get("num_decoder_layers", 6),
            **kw,
        )
    else:
        mk = lambda **kw: YoloDetector(
            num_classes=num_classes, variant=variant, **kw
        )
    model = mk()
    trainer = DetectionTrainer(
        model,
        DetTrainConfig(variant=variant, img_h=args.img_h, img_w=args.img_w,
                       optimizer=cfg_json.get("optimizer", "sgd")),
        steps_per_epoch=1,
    )
    state = trainer.init_state()
    state = CheckpointManager(ckpt_path.parent).restore(ckpt_path.name, state)
    variables = {"params": state.ema_params if args.use_ema else state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    ds = ZODMoEVisionDataset(
        ZODMoEDataConfig(
            frames_parquet=args.parquet,
            split_csv=str(Path(args.splits_dir) / "train_ids.csv"),
            img_h=args.img_h,
            img_w=args.img_w,
        )
    )
    loader = DetectionLoader(ds, batch_size=args.batch, drop_last=True)
    calib = []
    for batch in loader:
        calib.append(np.asarray(batch["image"]).astype(np.float32) / 255.0)
        if len(calib) >= args.calib_batches:
            break

    model_q = mk(int8=True)
    qvars = qz.quantize_detector(model, model_q, variables, calib)
    out = Path(args.out) if args.out else ckpt_path.parent / f"int8_quant_{ckpt_path.name}.npz"
    qz.save_quant_npz(out, qvars)
    n = sum(1 for _ in jax_leaves(qvars))
    print(f"Calibrated on {len(calib)} batches @ {args.img_h}x{args.img_w}; "
          f"{n} quant leaves -> {out}")


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()
