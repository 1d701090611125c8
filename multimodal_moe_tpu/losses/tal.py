"""Task-aligned label assignment + YOLO detection loss, fully vectorized.

The reference's training loss lives inside the Ultralytics binary; this is
the first-party TPU equivalent. Everything is static-shape: ground truth is
padded to ``(B, M, ...)`` with a validity mask, assignment is dense
``(B, M, A)`` tensor algebra (no per-image Python), so the whole loss fuses
into the backward pass under jit.

Recipe (standard anchor-free YOLO):

* align metric  t = score^alpha · IoU^beta  (alpha 0.5, beta 6.0)
* candidates: anchors whose center lies inside the GT box; top-k=10 by t
* conflicts (anchor claimed by several GTs) resolved by highest IoU
* targets: one-hot scaled by normalized align metric
* loss = 7.5·CIoU + 0.5·BCE(cls) + 1.5·DFL
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..models.yolo import REG_MAX
from ..ops.boxes import elementwise_ciou, pairwise_iou

ALPHA = 0.5
BETA = 6.0
TOPK = 10
EPS = 1e-9

BOX_GAIN = 7.5
CLS_GAIN = 0.5
DFL_GAIN = 1.5


class AssignResult(NamedTuple):
    target_boxes: jnp.ndarray    # (B, A, 4)
    target_scores: jnp.ndarray   # (B, A, nc) soft targets
    fg_mask: jnp.ndarray         # (B, A) bool


def assign_targets(
    pred_scores: jnp.ndarray,    # (B, A, nc) sigmoid probabilities
    pred_boxes: jnp.ndarray,     # (B, A, 4) xyxy pixels
    anchor_points: jnp.ndarray,  # (A, 2) pixels
    gt_labels: jnp.ndarray,      # (B, M) int32
    gt_boxes: jnp.ndarray,       # (B, M, 4) xyxy pixels
    gt_mask: jnp.ndarray,        # (B, M) bool
) -> AssignResult:
    """Dense task-aligned assignment over the whole batch."""
    b, a, nc = pred_scores.shape
    m = gt_boxes.shape[1]

    # Anchor centers inside GT boxes: (B, M, A)
    ap = anchor_points[None, None]                       # (1, 1, A, 2)
    lt = ap - gt_boxes[:, :, None, 0:2]
    rb = gt_boxes[:, :, None, 2:4] - ap
    in_gt = jnp.minimum(lt.min(-1), rb.min(-1)) > EPS    # (B, M, A)

    ious = pairwise_iou(gt_boxes, pred_boxes)            # (B, M, A)
    ious = jnp.clip(ious, 0.0, 1.0)

    # Score of each anchor for the GT's class: (B, M, A)
    cls_score = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),                  # (B, nc, A)
        jnp.clip(gt_labels, 0, nc - 1)[:, :, None],      # (B, M, 1)
        axis=1,
    )
    metric = (cls_score**ALPHA) * (ious**BETA)
    metric = jnp.where(in_gt & gt_mask[:, :, None], metric, 0.0)

    # top-k per GT → candidate mask (B, M, A) via scatter (a dense one-hot
    # over A would be ~B·M·K·A floats — far too large at A≈18k).
    k = min(TOPK, a)
    topk_vals, topk_idx = jax.lax.top_k(metric, k)
    scatter = jax.vmap(jax.vmap(lambda idx, val: jnp.zeros(a, jnp.bool_).at[idx].set(val)))
    # Strictly-positive test, not EPS: at cold start the align metric is
    # score^α·IoU^β ≈ 1e-12 (β=6 crushes small IoUs), and an epsilon floor
    # would reject every candidate → zero foreground forever. Anchors outside
    # the GT are exactly 0, so >0 keeps precisely the inside-GT candidates.
    cand = scatter(topk_idx, topk_vals > 0)
    cand = cand & in_gt & gt_mask[:, :, None]

    # Resolve anchors claimed by several GTs: keep the highest-IoU GT.
    claimed = cand.sum(axis=1)                            # (B, A)
    iou_masked = jnp.where(cand, ious, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=1)              # (B, A)
    keep = jax.nn.one_hot(best_gt, m, dtype=jnp.bool_, axis=1)  # (B, M, A)
    cand = jnp.where((claimed > 1)[:, None, :], cand & keep, cand)

    fg_mask = cand.any(axis=1)                            # (B, A)
    assigned_gt = jnp.argmax(cand, axis=1)                # (B, A) valid where fg

    # Gather per-anchor targets.
    batch_idx = jnp.arange(b)[:, None]
    target_boxes = gt_boxes[batch_idx, assigned_gt]       # (B, A, 4)
    target_labels = gt_labels[batch_idx, assigned_gt]     # (B, A)

    # Normalized align metric per GT (max metric → max IoU of that GT).
    metric_cand = jnp.where(cand, metric, 0.0)
    iou_cand = jnp.where(cand, ious, 0.0)
    per_gt_max_metric = metric_cand.max(axis=-1, keepdims=True)   # (B, M, 1)
    per_gt_max_iou = iou_cand.max(axis=-1, keepdims=True)
    # Relative normalization: an additive epsilon here would swamp the
    # ~1e-12 cold-start metrics and zero every target weight (same failure
    # mode as the candidate threshold above). The ratio is ≤ 1 by
    # construction, so a tiny floor is safe.
    norm = metric_cand * per_gt_max_iou / jnp.maximum(per_gt_max_metric, 1e-30)
    anchor_score = norm.max(axis=1)                        # (B, A)

    target_scores = (
        jax.nn.one_hot(jnp.clip(target_labels, 0, nc - 1), nc) * anchor_score[..., None]
    )
    target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)
    return AssignResult(target_boxes, target_scores, fg_mask)


def _dfl_loss(box_logits: jnp.ndarray, target_ltrb: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss: CE to the two bins bracketing the target.

    box_logits: (..., 4, REG_MAX); target_ltrb: (..., 4) in stride units.
    """
    t = jnp.clip(target_ltrb, 0.0, REG_MAX - 1 - 0.01)
    tl = jnp.floor(t)
    tr = tl + 1.0
    wl = tr - t
    wr = t - tl
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    ll = jnp.take_along_axis(logp, tl.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, tr.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    return -(wl * ll + wr * lr).mean(axis=-1)  # mean over 4 sides


def yolo_loss(
    outputs: "Dict[str, jnp.ndarray]",
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
) -> "tuple[jnp.ndarray, Dict[str, jnp.ndarray]]":
    """Total detection loss from :class:`YoloDetector` outputs + padded GT."""
    cls_logits = outputs["cls_logits"]
    box_logits = outputs["box_logits"]
    pred_boxes = outputs["boxes"]
    anchor_points = outputs["anchor_points"]
    anchor_strides = outputs["anchor_strides"]

    pred_scores = jax.nn.sigmoid(cls_logits)
    assign = assign_targets(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_boxes),
        anchor_points,
        gt_labels,
        gt_boxes,
        gt_mask,
    )

    target_sum = jnp.maximum(assign.target_scores.sum(), 1.0)

    # Classification: BCE against soft targets over all anchors.
    bce = optax_sigmoid_bce(cls_logits, assign.target_scores)
    cls_loss = bce.sum() / target_sum

    # Box losses on foreground anchors, weighted by target score.
    weight = assign.target_scores.sum(-1)                  # (B, A)
    ciou = elementwise_ciou(pred_boxes, assign.target_boxes)
    box_loss = ((1.0 - ciou) * weight * assign.fg_mask).sum() / target_sum

    # DFL to the assigned box, expressed as ltrb distances in stride units.
    t_lt = (anchor_points[None] - assign.target_boxes[..., 0:2]) / anchor_strides[None]
    t_rb = (assign.target_boxes[..., 2:4] - anchor_points[None]) / anchor_strides[None]
    target_ltrb = jnp.concatenate([t_lt, t_rb], axis=-1)   # (B, A, 4)
    logits4 = box_logits.reshape(box_logits.shape[:-1] + (4, REG_MAX))
    dfl = _dfl_loss(logits4, target_ltrb)
    dfl_loss_val = (dfl * weight * assign.fg_mask).sum() / target_sum

    total = BOX_GAIN * box_loss + CLS_GAIN * cls_loss + DFL_GAIN * dfl_loss_val
    metrics = {
        "loss": total,
        "box_loss": box_loss,
        "cls_loss": cls_loss,
        "dfl_loss": dfl_loss_val,
        "num_fg": assign.fg_mask.sum(),
    }
    return total, metrics


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid binary cross-entropy (soft targets)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
