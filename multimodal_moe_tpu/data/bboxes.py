"""Bounding-box math over the canonical format: absolute-pixel ``[x1,y1,x2,y2]``.

Behavioral contract matches the reference bbox module
(ref: src/data/bboxes.py:24-176):

* ``points_to_xyxy``  — multipoint → xyxy via min/max, ``None`` on degenerate
* ``xyxy_to_xywh``    — COCO-style top-left xywh (absolute pixels)
* ``xyxy_to_yolo``    — normalized center-xywh, default canvas 1248×704
* ``clamp_xyxy``      — clamp to ``[0, W-1] × [0, H-1]`` (zero-based indices)
* ``is_valid_box``    — min-size quality filter (default 2 px)

On top of the reference's scalar API this module adds **vectorized batch
variants** (``*_batch``) that operate on ``(N, 4)`` / ``(B, N, 4)`` arrays and
are safe to use inside jitted TPU code: they are pure elementwise numpy/jnp
expressions with static shapes, so XLA fuses them into adjacent compute for
free. The scalar functions remain for the CPU-side ETL scripts where the
reference uses them per-annotation.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np

DEFAULT_IMG_W = 1248
DEFAULT_IMG_H = 704


# ---------------------------------------------------------------------------
# Scalar API (CPU-side ETL; semantics identical to the reference)
# ---------------------------------------------------------------------------

def points_to_xyxy(points: Iterable) -> Optional[List[float]]:
    """Convert an iterable of ``(x, y)`` points into a canonical xyxy box.

    Returns ``None`` when the enclosing box is degenerate (zero width or
    height), mirroring the reference's degenerate rejection
    (ref: src/data/bboxes.py:54-57).
    """
    pts = np.stack([np.asarray(p, dtype=np.float32) for p in points])
    if pts.ndim != 2 or pts.shape[1] != 2:
        raise ValueError("Expected iterable of (x, y) points.")
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    if hi[0] <= lo[0] or hi[1] <= lo[1]:
        return None
    return [float(lo[0]), float(lo[1]), float(hi[0]), float(hi[1])]


def xyxy_to_xywh(box: Sequence[float]) -> List[float]:
    """xyxy → absolute top-left xywh (COCO convention, ref: src/data/bboxes.py:64-88)."""
    x1, y1, x2, y2 = (float(v) for v in box)
    return [x1, y1, x2 - x1, y2 - y1]


def xyxy_to_yolo(
    box: Sequence[float], img_w: int = DEFAULT_IMG_W, img_h: int = DEFAULT_IMG_H
) -> List[float]:
    """xyxy → YOLO normalized center-xywh (ref: src/data/bboxes.py:91-128)."""
    x1, y1, x2, y2 = (float(v) for v in box)
    w = x2 - x1
    h = y2 - y1
    return [(x1 + w / 2.0) / img_w, (y1 + h / 2.0) / img_h, w / img_w, h / img_h]


def clamp_xyxy(
    box: Sequence[float], img_w: int = DEFAULT_IMG_W, img_h: int = DEFAULT_IMG_H
) -> List[float]:
    """Clamp a box to valid zero-based pixel indices ``[0, W-1] × [0, H-1]``.

    (ref: src/data/bboxes.py:135-159 — note the ``-1``: the clamp targets the
    maximum valid *pixel index*, not the image extent.)
    """
    x1, y1, x2, y2 = (float(v) for v in box)
    xmax, ymax = img_w - 1, img_h - 1
    return [
        min(max(x1, 0.0), xmax),
        min(max(y1, 0.0), ymax),
        min(max(x2, 0.0), xmax),
        min(max(y2, 0.0), ymax),
    ]


def is_valid_box(box: Sequence[float], min_size: float = 2.0) -> bool:
    """Quality filter: both sides at least ``min_size`` px (ref: src/data/bboxes.py:162-176)."""
    x1, y1, x2, y2 = (float(v) for v in box)
    return (x2 - x1) >= min_size and (y2 - y1) >= min_size


# ---------------------------------------------------------------------------
# Vectorized batch API (device-friendly; usable under jit with jnp inputs)
# ---------------------------------------------------------------------------

def points_to_xyxy_batch(points, xp=np):
    """``(..., P, 2)`` point sets → ``(..., 4)`` xyxy boxes + validity mask.

    Degenerate boxes (the scalar API's ``None``) come back as a ``False``
    entry in the mask instead of a dynamic-length output, keeping shapes
    static for XLA.
    """
    lo = xp.min(points[..., 0:2], axis=-2)
    hi = xp.max(points[..., 0:2], axis=-2)
    boxes = xp.concatenate([lo, hi], axis=-1)
    valid = (hi[..., 0] > lo[..., 0]) & (hi[..., 1] > lo[..., 1])
    return boxes, valid


def xyxy_to_xywh_batch(boxes, xp=np):
    """``(..., 4)`` xyxy → absolute top-left xywh."""
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    return xp.concatenate([boxes[..., 0:2], wh], axis=-1)


def xyxy_to_yolo_batch(boxes, img_w: float = DEFAULT_IMG_W, img_h: float = DEFAULT_IMG_H, xp=np):
    """``(..., 4)`` xyxy → YOLO normalized center-xywh."""
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    ctr = boxes[..., 0:2] + wh / 2.0
    scale = xp.asarray([img_w, img_h], dtype=boxes.dtype)
    return xp.concatenate([ctr / scale, wh / scale], axis=-1)


def clamp_xyxy_batch(boxes, img_w: float = DEFAULT_IMG_W, img_h: float = DEFAULT_IMG_H, xp=np):
    """``(..., 4)`` xyxy clamped to ``[0, W-1] × [0, H-1]``."""
    hi = xp.asarray([img_w - 1, img_h - 1, img_w - 1, img_h - 1], dtype=boxes.dtype)
    return xp.clip(boxes, 0.0, hi)


def is_valid_box_batch(boxes, min_size: float = 2.0, xp=np):
    """``(..., 4)`` xyxy → bool mask of boxes at least ``min_size`` per side."""
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    return (wh[..., 0] >= min_size) & (wh[..., 1] >= min_size)
