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


def detr_topk_select(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    max_det: int = 300,
    score_threshold: float = 0.001,
) -> NmsResult:
    """NMS-free selection for the DETR family (per image, top ``max_det``
    queries by score) — the deployment tail RT-DETR exists for (ref:
    src/models/vision/rtdetr_thirdparty.py evaluates through pycocotools
    directly on query outputs; no NMS anywhere in that path)."""
    k = min(max_det, scores.shape[-1])
    top_scores, top_idx = lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    valid = top_scores > score_threshold
    classes = jnp.where(valid, 0, -1).astype(jnp.int32)
    return NmsResult(
        jnp.where(valid[..., None], top_boxes, 0.0),
        jnp.where(valid, top_scores, 0.0),
        classes,
        valid,
    )


def make_serving_step(
    model,
    *,
    pool: int = 512,
    iou_threshold: float = 0.7,
    score_threshold: float = 0.001,
    max_det: int = 300,
    early_exit: bool = False,
    tail: str = "full",
):
    """ONE jitted serving executable: uint8 images → :class:`NmsResult`.

    Everything — normalization, forward, candidate decode, NMS / top-k —
    runs in-graph (the tunneled runtime has no host callbacks, and one
    executable keeps the device queue shallow). Family is resolved from
    the model's *outputs*: DETR-style heads (no ``anchor_points``) take
    the NMS-free top-k tail; anchor detectors take full decode + batched
    NMS (``tail="full"``, the default) or the bit-identical
    decode-after-top-k tail (``tail="topk"``, single-class only,
    :func:`yolo_serving_nms`). The on-chip A/B at the serving batch (B128,
    v5e — docs/performance.md) measured full FASTER: the 512-row DFL
    gather is lane-hostile on the VPU while the dense full-anchor decode
    fuses cleanly (bf16 109.0 vs 111.3 ms; int8 85.6 vs 90.5). Params
    travel as jit arguments (closure-constant weights inflate the
    executable and poison tunnel bandwidth — see bench.py design notes).
    """
    context_aware = getattr(model, "context_aware", False)
    if tail not in ("full", "topk"):
        raise ValueError(f"tail must be 'full' or 'topk', got {tail!r}")

    @jax.jit
    def step(variables, images_u8, context_ids=None):
        images = images_u8.astype(jnp.float32) / 255.0
        kwargs = {}
        if context_aware and context_ids is not None:
            kwargs["context_ids"] = context_ids
        out = model.apply(variables, images, train=False, **kwargs)
        if "anchor_points" not in out:  # DETR family: NMS-free
            scores = jax.nn.sigmoid(out["cls_logits"][..., 0].astype(jnp.float32))
            return detr_topk_select(
                out["boxes"], scores,
                max_det=max_det, score_threshold=score_threshold,
            )
        if out["cls_logits"].shape[-1] == 1 and tail == "topk":
            return yolo_serving_nms(
                out, k=pool, iou_threshold=iou_threshold,
                score_threshold=score_threshold, max_det=max_det,
                early_exit=early_exit,
            )
        scores = jax.nn.sigmoid(out["cls_logits"][..., 0])
        return batched_nms(
            out["boxes"], scores,
            iou_threshold=iou_threshold, score_threshold=score_threshold,
            max_det=max_det, num_candidates=pool, early_exit=early_exit,
        )

    return step
