"""Batched non-maximum suppression with static shapes, TPU-first.

Replaces the torchvision/Ultralytics CUDA NMS the reference relies on
(SURVEY.md §2b; protocol: IoU 0.7, max_det 300,
ref: notes/experiment_protocol_camera.md:83-84).

Design for XLA (no dynamic shapes anywhere):

1. **Candidate preselect** — take the top ``num_candidates`` scoring boxes
   per image with one ``lax.top_k`` (scores below ``score_threshold`` are
   masked to -inf first, so they sort to the back and come out invalid).
2. **One dense IoU matrix** — ``(K, K)`` in fp32; for K≤1024 this is a
   handful of MiB in VMEM and one fused VPU pass.
3. **Greedy suppression as a fixed-trip scan** — the classic sequential
   dependence ("highest survivor suppresses its overlaps") is kept exact:
   each of ``max_det`` steps picks the argmax of the still-alive scores and
   kills everything above ``iou_threshold`` overlap with it. Each step is
   O(K) vector work on data already resident on-chip.

Outputs are fixed-size ``(max_det,)`` arrays with a validity mask — the
TPU-native replacement for the variable-length detection lists CUDA NMS
returns. vmap over the batch dimension gives batched NMS for free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class NmsResult(NamedTuple):
    boxes: jnp.ndarray    # (..., max_det, 4) xyxy; zeros where invalid
    scores: jnp.ndarray   # (..., max_det); NEG-masked entries → 0
    classes: jnp.ndarray  # (..., max_det) int32; -1 where invalid
    valid: jnp.ndarray    # (..., max_det) bool


def _single_image_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    *,
    iou_threshold: float,
    score_threshold: float,
    max_det: int,
    num_candidates: int,
    class_agnostic: bool,
    topk_mode: str = "exact",
    early_exit: bool = False,
) -> NmsResult:
    from .boxes import pairwise_iou

    n = scores.shape[0]
    k = min(num_candidates, n)

    masked_scores = jnp.where(scores > score_threshold, scores, NEG_INF)
    if topk_mode == "approx":
        # TPU-native tiled approximate top-k (aggregate_to_topk folds the
        # per-tile partial results to exactly k). With recall_target 0.99
        # over a k=512-1024 pool feeding max_det=300, any misses sit in the
        # score tail NMS would almost surely suppress anyway — the serving
        # fidelity knob, like the num_candidates pool itself
        # (docs/performance.md). Eval keeps the exact sort-based path.
        top_scores, top_idx = jax.lax.approx_max_k(
            masked_scores, k, recall_target=0.99, aggregate_to_topk=True
        )
    else:
        top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[top_idx]
    top_classes = classes[top_idx]

    iou = pairwise_iou(top_boxes, top_boxes)
    if not class_agnostic:
        # Boxes of different classes never suppress each other.
        same_class = top_classes[:, None] == top_classes[None, :]
        iou = jnp.where(same_class, iou, 0.0)

    def pick_one(alive_scores):
        pick = jnp.argmax(alive_scores)
        pick_score = alive_scores[pick]
        picked_valid = pick_score > NEG_INF / 2
        # Suppress everything overlapping the pick (including the pick itself).
        overlap = iou[pick] >= iou_threshold
        suppress = overlap | (jnp.arange(k) == pick)
        alive_scores = jnp.where(suppress & picked_valid, NEG_INF, alive_scores)
        # If nothing valid remains, keep emitting invalid picks.
        out = (
            jnp.where(picked_valid, pick, 0),
            jnp.where(picked_valid, pick_score, NEG_INF),
            picked_valid,
        )
        return alive_scores, out

    if early_exit:
        # Identical greedy sequence, but as a while_loop that stops once no
        # candidate above threshold remains. Trained detectors emit far fewer
        # than max_det survivors, so real serving/eval runs ~#objects steps
        # instead of always max_det (vmap runs max-over-batch iterations).
        # Exactness: the loop body is pick_one verbatim, and the untouched
        # buffer tail equals what exhausted scan steps would emit
        # (pick 0 / NEG_INF / invalid) — parity-tested vs the scan path.
        def cond(state):
            i, alive_scores, _ = state
            return (i < max_det) & jnp.any(alive_scores > NEG_INF / 2)

        def body(state):
            i, alive_scores, bufs = state
            alive_scores, (p, s, v) = pick_one(alive_scores)
            picks, pick_scores, pick_valid = bufs
            bufs = (
                picks.at[i].set(p),
                pick_scores.at[i].set(s),
                pick_valid.at[i].set(v),
            )
            return i + 1, alive_scores, bufs

        init_bufs = (
            jnp.zeros((max_det,), jnp.int32),
            jnp.full((max_det,), NEG_INF, jnp.float32),
            jnp.zeros((max_det,), bool),
        )
        _, _, (picks, pick_scores, pick_valid) = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), top_scores, init_bufs)
        )
    else:
        (picks, pick_scores, pick_valid) = jax.lax.scan(
            lambda carry, _: pick_one(carry), top_scores, None, length=max_det
        )[1]

    out_boxes = jnp.where(pick_valid[:, None], top_boxes[picks], 0.0)
    out_scores = jnp.where(pick_valid, pick_scores, 0.0)
    out_classes = jnp.where(pick_valid, top_classes[picks], -1)
    return NmsResult(out_boxes, out_scores, out_classes.astype(jnp.int32), pick_valid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iou_threshold",
        "score_threshold",
        "max_det",
        "num_candidates",
        "class_agnostic",
        "topk_mode",
        "early_exit",
    ),
)
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: "jnp.ndarray | None" = None,
    *,
    iou_threshold: float = 0.7,
    score_threshold: float = 0.001,
    max_det: int = 300,
    num_candidates: int = 1024,
    class_agnostic: bool = False,
    topk_mode: str = "exact",
    early_exit: bool = False,
) -> NmsResult:
    """NMS over a batch: ``boxes (B, N, 4)``, ``scores (B, N)``,
    optional ``classes (B, N)`` → fixed-shape :class:`NmsResult`.

    Defaults match the locked benchmark protocol (IoU 0.7, max_det 300).
    ``early_exit=True`` swaps the fixed-trip suppression scan for an exact
    while_loop that stops when no candidate remains (same results; faster
    on real detections where survivors ≪ max_det).
    """
    if classes is None:
        classes = jnp.zeros(scores.shape, dtype=jnp.int32)
    fn = functools.partial(
        _single_image_nms,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        max_det=max_det,
        num_candidates=num_candidates,
        class_agnostic=class_agnostic,
        topk_mode=topk_mode,
        early_exit=early_exit,
    )
    return jax.vmap(fn)(boxes, scores, classes)
