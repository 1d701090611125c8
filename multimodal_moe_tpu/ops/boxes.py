"""Device-side box geometry: conversions, pairwise IoU, GIoU/CIoU.

The reference delegates all of this to Ultralytics/torchvision CUDA ops
(SURVEY.md §2b). Here every op is a static-shape jnp expression that XLA can
fuse and tile onto the VPU/MXU; all functions broadcast over arbitrary
leading batch dimensions and are differentiable where it matters (GIoU/CIoU
for box-regression losses).

Coordinate convention follows the project-wide canonical format: absolute
pixels, ``[x1, y1, x2, y2]`` (ref: src/data/bboxes.py:7-13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """``(..., 4)`` xyxy → center-xywh."""
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    ctr = (boxes[..., 0:2] + boxes[..., 2:4]) * 0.5
    return jnp.concatenate([ctr, wh], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """``(..., 4)`` center-xywh → xyxy."""
    half = boxes[..., 2:4] * 0.5
    return jnp.concatenate([boxes[..., 0:2] - half, boxes[..., 0:2] + half], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """``(..., 4)`` xyxy → area, clamped at zero for degenerate boxes."""
    wh = jnp.maximum(boxes[..., 2:4] - boxes[..., 0:2], 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between ``(..., N, 4)`` and ``(..., M, 4)`` → ``(..., N, M)``.

    Pure elementwise/broadcast ops — under jit XLA fuses the whole matrix
    into one VPU pass; no gather, no dynamic shapes.
    """
    a = boxes_a[..., :, None, :]  # (..., N, 1, 4)
    b = boxes_b[..., None, :, :]  # (..., 1, M, 4)
    lt = jnp.maximum(a[..., 0:2], b[..., 0:2])
    rb = jnp.minimum(a[..., 2:4], b[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes_a)[..., :, None] + box_area(boxes_b)[..., None, :] - inter
    return inter / (union + EPS)


def elementwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU between aligned box arrays ``(..., 4)`` vs ``(..., 4)`` → ``(...)``."""
    lt = jnp.maximum(boxes_a[..., 0:2], boxes_b[..., 0:2])
    rb = jnp.minimum(boxes_a[..., 2:4], boxes_b[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes_a) + box_area(boxes_b) - inter
    return inter / (union + EPS)


def elementwise_giou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU (differentiable regression target), aligned ``(..., 4)``."""
    iou = elementwise_iou(boxes_a, boxes_b)
    lt = jnp.minimum(boxes_a[..., 0:2], boxes_b[..., 0:2])
    rb = jnp.maximum(boxes_a[..., 2:4], boxes_b[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    enclose = wh[..., 0] * wh[..., 1]
    lt_i = jnp.maximum(boxes_a[..., 0:2], boxes_b[..., 0:2])
    rb_i = jnp.minimum(boxes_a[..., 2:4], boxes_b[..., 2:4])
    wh_i = jnp.maximum(rb_i - lt_i, 0.0)
    inter = wh_i[..., 0] * wh_i[..., 1]
    union = box_area(boxes_a) + box_area(boxes_b) - inter
    return iou - (enclose - union) / (enclose + EPS)


def pairwise_giou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """GIoU matrix ``(..., N, M)`` (used by the DETR Hungarian cost)."""
    a = boxes_a[..., :, None, :]
    b = boxes_b[..., None, :, :]
    return elementwise_giou(
        jnp.broadcast_to(a, a.shape[:-3] + (a.shape[-3], b.shape[-2], 4)),
        jnp.broadcast_to(b, b.shape[:-3] + (a.shape[-3], b.shape[-2], 4)),
    )


def elementwise_ciou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU (YOLO-family box loss), aligned ``(..., 4)``."""
    iou = elementwise_iou(boxes_a, boxes_b)
    # center distance over enclosing diagonal
    ctr_a = (boxes_a[..., 0:2] + boxes_a[..., 2:4]) * 0.5
    ctr_b = (boxes_b[..., 0:2] + boxes_b[..., 2:4]) * 0.5
    rho2 = jnp.sum((ctr_a - ctr_b) ** 2, axis=-1)
    lt = jnp.minimum(boxes_a[..., 0:2], boxes_b[..., 0:2])
    rb = jnp.maximum(boxes_a[..., 2:4], boxes_b[..., 2:4])
    diag2 = jnp.sum((rb - lt) ** 2, axis=-1) + EPS
    # aspect-ratio term
    wh_a = jnp.maximum(boxes_a[..., 2:4] - boxes_a[..., 0:2], EPS)
    wh_b = jnp.maximum(boxes_b[..., 2:4] - boxes_b[..., 0:2], EPS)
    v = (4.0 / (jnp.pi**2)) * (
        jnp.arctan(wh_b[..., 0] / wh_b[..., 1]) - jnp.arctan(wh_a[..., 0] / wh_a[..., 1])
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + EPS))
    return iou - rho2 / diag2 - alpha * v
