"""Serving-side model/checkpoint loading shared by the inference CLIs
(scripts/predict_detector.py, scripts/serve_detector.py).

The reference reaches inference through Ultralytics' model registry
(ref: src/models/vision/yolo.py:76-95 — ``YOLO(weights)`` resolves the
family and architecture from the checkpoint file itself); here a run
directory carries ``model_config.json`` plus an Orbax checkpoint, and
this module is the single place that maps them back to a constructed
Flax model and restored serving variables.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Iterable, Tuple


def resolve_checkpoint(weights: Path, which: str = "best") -> "Tuple[Path, dict]":
    """Accept a run dir, a weights dir, or a checkpoint dir; return the
    checkpoint path plus the nearest ``model_config.json`` (searched at the
    given dir and up to two parents — the run layout puts it beside
    ``weights/``)."""
    weights = Path(weights)
    cfg: Dict[str, Any] = {}
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


def build_detector(model_cfg: dict, *, int8: bool = False, fp_box: bool = False):
    """``model_config.json`` → (family, constructed Flax model).

    ``fp_box`` (yolo/moe int8 only) keeps the DFL box-regression branch fp —
    the strict-IoU PTQ accuracy mode (see models.yolo.DetectHead.fp_box)."""
    family = model_cfg.get("family", "yolo")
    num_classes = model_cfg.get("num_classes", 1)
    variant = model_cfg.get("variant", "s")
    extra = {"int8": True} if int8 else {}
    if family == "moe":
        from .models.moe_yolo import MoEYoloDetector

        if int8 and fp_box:
            extra["int8_fp_box"] = True
        return family, MoEYoloDetector(
            num_classes=num_classes, variant=variant,
            num_experts=model_cfg.get("num_experts", 4),
            **extra,
        )
    if family == "rtdetr":
        from .models.rtdetr import RTDETRDetector

        return family, RTDETRDetector(
            num_classes=num_classes,
            hidden_dim=model_cfg.get("hidden_dim", 256),
            num_queries=model_cfg.get("num_queries", 300),
            num_decoder_layers=model_cfg.get("num_decoder_layers", 6),
            **extra,
        )
    from .models.yolo import YoloDetector

    if int8 and fp_box:
        extra["int8_fp_box"] = True
    return "yolo", YoloDetector(
        num_classes=num_classes, variant=variant, **extra,
    )


@dataclass
class LoadedDetector:
    family: str
    model: Any
    model_cfg: Dict[str, Any]
    variables: Dict[str, Any]
    ckpt_path: Path


def load_detector(
    weights,
    *,
    checkpoint: str = "best",
    img_h: int = 704,
    img_w: int = 1248,
    use_ema: bool = True,
) -> LoadedDetector:
    """Run dir → restored serving model. EMA params by default (the
    protocol's eval channel, ref: notes/experiment_protocol_camera.md)."""
    from .train.detection import DetTrainConfig, DetectionTrainer
    from .train.state import CheckpointManager

    ckpt_path, model_cfg = resolve_checkpoint(Path(weights).resolve(), checkpoint)
    family, model = build_detector(model_cfg)
    trainer = DetectionTrainer(
        model,
        DetTrainConfig(
            variant=model_cfg.get("variant", "s"),
            img_h=img_h, img_w=img_w,
            optimizer=model_cfg.get("optimizer", "sgd"),
        ),
        steps_per_epoch=1,
    )
    state = CheckpointManager(ckpt_path.parent).restore_eval(
        ckpt_path.name, trainer.init_state()
    )
    params = state.ema_params if use_ema else state.params
    variables: Dict[str, Any] = {"params": params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return LoadedDetector(family, model, model_cfg, variables, ckpt_path)


def quantize_loaded(
    loaded: LoadedDetector,
    calib_batches: Iterable,
    *,
    fp_box: bool = False,
    mode: str = "absmax",
) -> LoadedDetector:
    """int8 PTQ serving twin of a loaded detector: reuse a cached quant npz
    beside the checkpoint when present (``int8_quant.npz`` or the eval CLI's
    ``int8_quant_<ckpt>.npz``), else calibrate on ``calib_batches``
    (normalized float image batches — the quant.calibrate contract).
    MoE/RT-DETR and the ``fp_box`` accuracy mode quantize a sub-region of
    the net, so their quantized variables are merged over the fp ones. The
    npz is always built for the full-int8 model (superset), shared by both
    serving modes."""
    from . import quant as qz

    _, model_q = build_detector(loaded.model_cfg, int8=True)
    qvars = None
    for name in ("int8_quant.npz", f"int8_quant_{loaded.ckpt_path.name}.npz"):
        qnpz = loaded.ckpt_path.parent / name
        if qnpz.exists():
            qvars = qz.load_quant_npz(qnpz)
            break
    if qvars is None:
        qvars = qz.quantize_detector(
            loaded.model, model_q, loaded.variables, list(calib_batches),
            mode=mode,
        )
    if loaded.family in ("moe", "rtdetr") or fp_box:
        qvars = qz.merge_serving_variables(qvars, loaded.variables)
    model_serve = model_q
    if fp_box and loaded.family in ("moe", "yolo"):
        _, model_serve = build_detector(loaded.model_cfg, int8=True, fp_box=True)
    return LoadedDetector(
        loaded.family, model_serve, loaded.model_cfg, qvars, loaded.ckpt_path
    )
