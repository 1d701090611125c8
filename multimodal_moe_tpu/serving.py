"""Serving-path helpers: decode-after-top-k candidate selection.

The reference has no deployment story beyond Ultralytics' fp16 CUDA
``model.val`` path (ref: src/models/vision/yolo.py:128-172); here serving is
a first-class TPU concern. The detector's ``__call__`` decodes DFL boxes for
every anchor (~18k at 704×1248) because the training loss and the TAL
assigner need them all; serving only ever keeps the NMS candidate pool
(K=512-1024). :func:`topk_candidates` reorders the pipeline —

    cls scores → top-k → gather box logits → DFL-decode K rows → NMS

— so the softmax-expectation decode runs on K rows instead of A, and the
full-anchor ``boxes`` output goes unused, letting XLA dead-code-eliminate
the all-anchor decode entirely. The candidate set, ordering, and decoded
values are bit-identical to the full path (same masked top-k the NMS
preselect would have done; decode is row-wise), verified in
tests/test_serving.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .models.yolo import decode_boxes
from .ops.nms import NEG_INF, NmsResult, batched_nms


def topk_candidates(
    out: dict,
    *,
    k: int = 512,
    score_threshold: float = 0.001,
) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """Model outputs → (boxes (B,K,4), scores (B,K)), DFL-decoding only the
    top-k anchors by class score (single-class; the locked protocol's
    setting). Scores below ``score_threshold`` come out as ``NEG_INF`` so a
    downstream :func:`batched_nms` masks them exactly as the full path does.
    """
    cls_logits = out["cls_logits"]
    if cls_logits.shape[-1] != 1:
        raise ValueError(
            "topk_candidates is single-class (protocol); got "
            f"{cls_logits.shape[-1]} classes"
        )
    scores = jax.nn.sigmoid(cls_logits[..., 0].astype(jnp.float32))
    masked = jnp.where(scores > score_threshold, scores, NEG_INF)
    k = min(k, masked.shape[-1])  # same clamp batched_nms applies to its pool
    top_scores, top_idx = lax.top_k(masked, k)  # (B, K)
    box_logits = jnp.take_along_axis(out["box_logits"], top_idx[..., None], axis=1)
    points = out["anchor_points"][top_idx]      # (B, K, 2)
    strides = out["anchor_strides"][top_idx]    # (B, K, 1)
    boxes = decode_boxes(box_logits, points, strides)
    return boxes, top_scores


def yolo_serving_nms(
    out: dict,
    *,
    k: int = 512,
    iou_threshold: float = 0.7,
    score_threshold: float = 0.001,
    max_det: int = 300,
    early_exit: bool = False,
) -> NmsResult:
    """Full serving tail: top-k candidate decode + batched NMS, identical
    results to ``batched_nms(out['boxes'], sigmoid(cls), num_candidates=k)``.
    """
    boxes, scores = topk_candidates(out, k=k, score_threshold=score_threshold)
    return batched_nms(
        boxes,
        scores,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        max_det=max_det,
        num_candidates=k,
        early_exit=early_exit,
    )
