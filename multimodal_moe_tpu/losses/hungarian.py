"""Hungarian (bipartite) matching + DETR-family set losses.

The reference consumes this from RT-DETRv2's torch code; here the cost
matrix (focal-style class cost + L1 + GIoU, the RT-DETR recipe) is computed
on device with static shapes, and the assignment itself is the in-graph
exact Jonker-Volgenant solver (ops/assignment.py) — host callbacks are
unavailable on the tunneled TPU runtime, so the whole matcher must live
inside the jitted step. Padded GT rows carry a large constant cost so they
match only leftover queries; their matches are masked out of the loss.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import cxcywh_to_xyxy, pairwise_giou

BIG_COST = 1e6


def hungarian_match(
    pred_logits: jnp.ndarray,   # (B, Q, nc)
    pred_boxes: jnp.ndarray,    # (B, Q, 4) cxcywh normalized
    gt_labels: jnp.ndarray,     # (B, M)
    gt_boxes: jnp.ndarray,      # (B, M, 4) cxcywh normalized
    gt_mask: jnp.ndarray,       # (B, M) bool
    *,
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """→ (B, M) index of the query assigned to each (padded) GT slot."""
    b, q, nc = pred_logits.shape
    m = gt_boxes.shape[1]

    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    # Focal-style class cost (RT-DETR/DINO convention).
    neg = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    labels = jnp.clip(gt_labels, 0, nc - 1)
    cls_cost = (
        jnp.take_along_axis(pos[:, :, None, :], labels[:, None, :, None], axis=-1)
        - jnp.take_along_axis(neg[:, :, None, :], labels[:, None, :, None], axis=-1)
    )[..., 0]                                              # (B, Q, M)

    l1_cost = jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]).sum(-1)
    giou_cost = -pairwise_giou(
        cxcywh_to_xyxy(pred_boxes.astype(jnp.float32)),
        cxcywh_to_xyxy(gt_boxes.astype(jnp.float32)),
    )

    cost = cost_class * cls_cost + cost_bbox * l1_cost + cost_giou * giou_cost
    cost = jnp.where(gt_mask[:, None, :], cost, BIG_COST)
    cost = jnp.nan_to_num(cost, nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST)

    # In-graph exact solver — the TPU runtime has no host-callback support,
    # so scipy-via-pure_callback cannot run inside the jitted train step
    # (scipy remains the test oracle; see ops/assignment.py).
    from ..ops.assignment import batched_lsa_assign

    assigned = batched_lsa_assign(jax.lax.stop_gradient(cost), gt_mask)
    return assigned


def detr_loss(
    outputs: "Dict[str, jnp.ndarray]",
    gt_labels: jnp.ndarray,
    gt_boxes_xyxy: jnp.ndarray,   # (B, M, 4) absolute pixels
    gt_mask: jnp.ndarray,
    *,
    img_hw: "Tuple[int, int]",
    aux_weight: float = 1.0,
) -> "Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]":
    """Set loss over final + auxiliary decoder layers (VFL-style BCE with
    IoU-aware targets + L1 + GIoU)."""
    h, w = img_hw
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    gt_xyxy_n = gt_boxes_xyxy / scale
    gt_cxcywh = jnp.stack(
        [
            (gt_xyxy_n[..., 0] + gt_xyxy_n[..., 2]) / 2,
            (gt_xyxy_n[..., 1] + gt_xyxy_n[..., 3]) / 2,
            gt_xyxy_n[..., 2] - gt_xyxy_n[..., 0],
            gt_xyxy_n[..., 3] - gt_xyxy_n[..., 1],
        ],
        axis=-1,
    )

    # Encoder query-selection head (top-k gathered) is matched as one more
    # auxiliary layer — without it enc_score/enc_bbox get zero gradient and
    # IoU-aware query selection never trains (RT-DETRv2 recipe).
    enc_layer = outputs.get("enc_outputs")
    layers = ([enc_layer] if enc_layer is not None else []) + outputs["aux_outputs"] + [
        {"pred_logits": outputs["pred_logits"], "pred_boxes": outputs["pred_boxes"]}
    ]
    # One batched matcher call for ALL decoder layers: the LSA solver's
    # sequential sweeps dominate the loss cost, and L layers × B images
    # vmap into a single solve instead of L serial ones.
    n_layers = len(layers)
    b = gt_mask.shape[0]
    stack_logits = jnp.stack([l["pred_logits"] for l in layers])   # (L, B, Q, nc)
    stack_boxes = jnp.stack([l["pred_boxes"] for l in layers])     # (L, B, Q, 4)
    assigned_all = hungarian_match(
        stack_logits.reshape((n_layers * b,) + stack_logits.shape[2:]),
        stack_boxes.reshape((n_layers * b,) + stack_boxes.shape[2:]),
        jnp.tile(gt_labels, (n_layers, 1)),
        jnp.tile(gt_cxcywh, (n_layers, 1, 1)),
        jnp.tile(gt_mask, (n_layers, 1)),
    ).reshape(n_layers, b, -1)

    total = jnp.zeros(())
    metrics: "Dict[str, jnp.ndarray]" = {}
    for li, layer in enumerate(layers):
        weight = 1.0 if li == len(layers) - 1 else aux_weight
        l, m = _single_layer_loss(
            layer["pred_logits"], layer["pred_boxes"], gt_labels, gt_cxcywh,
            gt_mask, assigned=assigned_all[li],
        )
        total = total + weight * l
        if li == len(layers) - 1:
            metrics = m

    # Contrastive-denoising branch: identity matching (slot j ↔ GT j%M),
    # positives reconstruct their GT, negatives predict background.
    dn_layers = outputs.get("dn_outputs") or []
    if dn_layers:
        dn_total = jnp.zeros(())
        for layer in dn_layers:
            dn_total = dn_total + _dn_layer_loss(
                layer["pred_logits"], layer["pred_boxes"],
                outputs["dn_is_pos"], gt_cxcywh, gt_mask,
            )
        dn_total = dn_total / len(dn_layers)
        total = total + dn_total
        metrics["dn_loss"] = dn_total
    metrics["loss"] = total
    return total, metrics


def _dn_layer_loss(pred_logits, pred_boxes, dn_is_pos, gt_cxcywh, gt_mask):
    """Denoising loss for one decoder layer.

    Slot layout (build_denoising_queries): slot = g2·M + j, source GT index
    j = slot % M; even half-groups are positives."""
    b, d_slots, nc = pred_logits.shape
    m = gt_cxcywh.shape[1]
    src = jnp.arange(d_slots) % m                                  # (D,)
    tgt_boxes = gt_cxcywh[:, src]                                  # (B, D, 4)
    valid = gt_mask[:, src]                                        # (B, D)
    pos = valid & dn_is_pos[None, :]
    num_pos = jnp.maximum(pos.sum(), 1.0)

    from ..ops.boxes import elementwise_giou

    l1 = jnp.abs(pred_boxes - tgt_boxes).sum(-1)
    giou = elementwise_giou(
        cxcywh_to_xyxy(pred_boxes.astype(jnp.float32)),
        cxcywh_to_xyxy(tgt_boxes.astype(jnp.float32)),
    )
    box_loss = (l1 * pos).sum() / num_pos
    giou_loss = ((1.0 - giou) * pos).sum() / num_pos

    # Classification: positives target stop-grad IoU, negatives/invalid 0.
    iou_t = jax.lax.stop_gradient(jnp.clip(giou, 0.0, 1.0)) * pos
    target = iou_t[..., None] * jax.nn.one_hot(jnp.zeros((b, d_slots), jnp.int32), nc)
    logits = pred_logits.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p = jax.nn.sigmoid(logits)
    neg_w = jax.lax.stop_gradient(p**2.0) * 0.75
    w = jnp.where(target > 0, target, neg_w)
    # Padded (invalid) slots contribute nothing at all.
    w = w * valid[..., None]
    cls_loss = (bce * w).sum() / num_pos

    return cls_loss + 5.0 * box_loss + 2.0 * giou_loss


def _single_layer_loss(pred_logits, pred_boxes, gt_labels, gt_cxcywh, gt_mask,
                       assigned=None):
    b, q, nc = pred_logits.shape
    if assigned is None:
        assigned = hungarian_match(pred_logits, pred_boxes, gt_labels, gt_cxcywh, gt_mask)

    batch_idx = jnp.arange(b)[:, None]
    matched_boxes = pred_boxes[batch_idx, assigned]          # (B, M, 4)
    matched_logit_rows = assigned                            # (B, M)

    num_gt = jnp.maximum(gt_mask.sum(), 1.0)

    # Box losses on matched pairs.
    l1 = jnp.abs(matched_boxes - gt_cxcywh).sum(-1)
    from ..ops.boxes import elementwise_giou

    giou = elementwise_giou(
        cxcywh_to_xyxy(matched_boxes.astype(jnp.float32)),
        cxcywh_to_xyxy(gt_cxcywh.astype(jnp.float32)),
    )
    box_loss = (l1 * gt_mask).sum() / num_gt
    giou_loss = ((1.0 - giou) * gt_mask).sum() / num_gt

    # IoU-aware classification targets (VFL-style): matched queries get the
    # (stop-grad) IoU of their box as the soft target, others 0.
    iou_q = jnp.zeros((b, q))
    iou_val = jax.lax.stop_gradient(jnp.clip(giou, 0.0, 1.0)) * gt_mask
    iou_q = iou_q.at[batch_idx, matched_logit_rows].max(iou_val)
    target = iou_q[..., None] * jax.nn.one_hot(jnp.zeros((b, q), jnp.int32), nc)

    logits = pred_logits.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    # VFL down-weights easy negatives by p^gamma.
    p = jax.nn.sigmoid(logits)
    neg_w = jax.lax.stop_gradient(p**2.0) * 0.75
    w = jnp.where(target > 0, target, neg_w)
    cls_loss = (bce * w).sum() / num_gt

    total = cls_loss + 5.0 * box_loss + 2.0 * giou_loss
    return total, {
        "cls_loss": cls_loss,
        "box_loss": box_loss,
        "giou_loss": giou_loss,
        "num_fg": gt_mask.sum(),
    }
