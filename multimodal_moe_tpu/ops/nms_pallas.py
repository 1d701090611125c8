"""Pallas TPU kernel for greedy NMS suppression.

The XLA path (ops/nms.py) runs the greedy loop as a ``max_det``-step
``lax.scan`` over HBM-resident tensors; this kernel keeps the candidate
IoU matrix in VMEM and runs the exact sequential-greedy sweep in one kernel
launch — one VPU vector op per step, no HBM round-trips.

Formulation: candidates are pre-sorted by descending score (one ``top_k``
outside). The kernel computes the (K, K) IoU matrix on-chip and sweeps
``alive`` in score order: a still-alive candidate kills every later
candidate overlapping it at ≥ ``iou_threshold`` — exactly the serial greedy
algorithm, so results are bit-identical to the oracle. Final
top-``max_det`` compaction happens outside with one more ``top_k`` (fixed
shapes throughout, keep order == score order == greedy pick order).

TPU layout notes: boxes travel transposed as (4, K) and masks as (1, K)
int32 so the lane dimension is K (≥128-aligned); K defaults to 512 → the
IoU matrix is 1MB of VMEM.

Grid: one program per image.

Status (round 3): **experimental / opt-in**. Bit-exact parity holds
(tests/test_nms_pallas.py) but the kernel is wall-clock neutral vs the XLA
scan at serving pool sizes (K ≤ 1024) across two rounds of measurement —
the suppression loop is not where serving time lives (docs/performance.md).
The production path is ops/nms.py (XLA scan, or its exact ``early_exit``
while_loop for real detections where survivors ≪ max_det).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_keep_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float):
    """boxes (B, 4, K) f32 score-sorted; valid (B, 1, K) i32 → keep (B, 1, K) i32.

    One program handles the WHOLE batch: each greedy step computes the
    current pick's overlap row against all K candidates of all B images as
    one (B, K) vector op — the batch dimension vectorizes over sublanes
    instead of serializing over grid programs. No K×K matrix is
    materialized; suppression rows are built on the fly from the
    VMEM-resident boxes."""
    b, _, k = boxes_ref.shape
    x1 = boxes_ref[:, 0, :]                                           # (B, K)
    y1 = boxes_ref[:, 1, :]
    x2 = boxes_ref[:, 2, :]
    y2 = boxes_ref[:, 3, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)      # (B, K)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def body(i, alive):                                                # (B, K) i32
        # The i-th candidate of every image via masked reductions (dynamic
        # indexing of the 128-lane dimension is not lowerable).
        sel = lane_ids == i                                            # (B, K)
        bx1 = jnp.sum(jnp.where(sel, x1, 0.0), axis=1, keepdims=True)  # (B, 1)
        by1 = jnp.sum(jnp.where(sel, y1, 0.0), axis=1, keepdims=True)
        bx2 = jnp.sum(jnp.where(sel, x2, 0.0), axis=1, keepdims=True)
        by2 = jnp.sum(jnp.where(sel, y2, 0.0), axis=1, keepdims=True)
        inter = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0) * (
            jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0)
        )                                                              # (B, K)
        area_i = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        iou = inter / (area_i + area - inter + 1e-7)
        # alive[:, i] per image via masked reduction (keepdims for broadcast)
        alive_i = jnp.sum(
            jnp.where(lane_ids == i, alive, 0), axis=1, keepdims=True
        )                                                              # (B, 1)
        kill = (iou >= iou_threshold).astype(jnp.int32) * (
            lane_ids > i
        ).astype(jnp.int32) * alive_i
        return alive * (1 - kill)

    alive = jax.lax.fori_loop(0, k, body, valid_ref[:, 0, :])
    out_ref[:, 0, :] = alive


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_mask_pallas(
    boxes_t: jnp.ndarray,    # (B, 4, K) f32, score-sorted along K
    valid: jnp.ndarray,      # (B, K) int32
    *,
    iou_threshold: float = 0.7,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ (B, K) int32 keep mask."""
    b, _, k = boxes_t.shape
    kernel = functools.partial(_nms_keep_kernel, iou_threshold=iou_threshold)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        interpret=interpret,
    )(boxes_t, valid.astype(jnp.int32)[:, None, :])[:, 0, :]


def batched_nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    iou_threshold: float = 0.7,
    score_threshold: float = 0.001,
    max_det: int = 300,
    num_candidates: int = 512,
    interpret: bool = False,
):
    """Drop-in batched NMS on the Pallas suppression kernel (single-class /
    class-agnostic path; same contract as ops.nms.batched_nms)."""
    from .nms import NEG_INF, NmsResult

    b, n = scores.shape
    k = min(num_candidates, n)
    masked = jnp.where(scores > score_threshold, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    valid_in = top_scores > NEG_INF / 2

    keep = nms_keep_mask_pallas(
        top_boxes.transpose(0, 2, 1),
        valid_in,
        iou_threshold=iou_threshold,
        interpret=interpret,
    )

    sel_scores = jnp.where(keep > 0, top_scores, NEG_INF)
    out_scores, sel_idx = jax.lax.top_k(sel_scores, max_det)
    out_valid = out_scores > NEG_INF / 2
    out_boxes = jnp.take_along_axis(top_boxes, sel_idx[..., None], axis=1)
    out_boxes = jnp.where(out_valid[..., None], out_boxes, 0.0)
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    classes = jnp.where(out_valid, 0, -1).astype(jnp.int32)
    return NmsResult(out_boxes, out_scores, classes, out_valid)
