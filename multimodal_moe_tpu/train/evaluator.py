"""Detection evaluator: device inference + NMS → in-framework COCO metrics
+ per-stage speed accounting.

Produces the exact metrics dict the reference writes to ``metrics.json``
(map50 / map50_95 / precision / recall / speed_*_ms_per_img / params /
curves_results — ref: src/models/vision/yolo.py:185-307), with timings from
the real pipeline stages instead of Ultralytics' profiler:

* preprocess  — host decode + batch assembly + H2D transfer
* inference   — jitted forward (device-synchronized)
* postprocess — batched NMS (device-synchronized)
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.coco_map import evaluate_detections
from ..ops.nms import batched_nms
from ..utils import watchdog


def make_inference_step(
    model,
    *,
    use_sigmoid: bool = True,
    topk_decode: bool = True,
    num_candidates: int = 1024,
    score_threshold: float = 0.001,
):
    """Jitted forward taking ``variables`` as an argument: build ONCE and
    reuse across epochs/checkpoints — rebuilding a ``jax.jit`` per epoch
    (as a naive per-epoch ``make_inference_fn`` does) accumulates loaded
    executables in the client for the life of the process.

    For single-class anchor-based detectors (YOLO family), the default
    ``topk_decode`` returns the ``num_candidates``-candidate pool with DFL
    decode run only on those rows (serving.topk_candidates) — bit-identical
    to full decode + the NMS preselect at the same pool size, but the
    full-anchor decode is dead code XLA removes. ``num_candidates`` /
    ``score_threshold`` must match the downstream NMS call (they do:
    both use the batched_nms defaults)."""
    context_aware = getattr(model, "context_aware", False)

    # Params are jit arguments, not closure constants (closure-constant
    # weights bloat the executable and poison transfer bandwidth on the
    # remote-TPU tunnel; see memory: axon-closure-constants).
    @jax.jit
    def infer_v(variables, images_u8, context_ids=None):
        images = images_u8.astype(jnp.float32) / 255.0
        kwargs = {}
        if context_aware and context_ids is not None:
            kwargs["context_ids"] = context_ids
        out = model.apply(variables, images, train=False, **kwargs)
        if (
            topk_decode
            and use_sigmoid
            and "anchor_points" in out
            and out["cls_logits"].shape[-1] == 1
        ):
            from ..serving import topk_candidates

            return topk_candidates(
                out, k=num_candidates, score_threshold=score_threshold
            )
        scores = out["cls_logits"][..., 0]
        if use_sigmoid:
            scores = jax.nn.sigmoid(scores)
        return out["boxes"], scores

    return infer_v


def make_inference_fn(model, variables, *, use_sigmoid: bool = True):
    """Jitted forward: uint8 images → (boxes, scores) per anchor/query.

    Context-aware models (MoE) receive the per-image solar bin ids."""
    infer_v = make_inference_step(model, use_sigmoid=use_sigmoid)

    def infer(images_u8, context_ids=None):
        return infer_v(variables, images_u8, context_ids)

    return infer


def model_flops_g(model, variables, img_h: int, img_w: int) -> "float | None":
    """Analytical forward FLOPs in GFLOPs for one image, from XLA's cost
    analysis of the lowered forward graph. First-party replacement for the
    reference's best-effort thop/Ultralytics FLOPs reporting
    (ref: src/models/vision/yolo.py:98-125). Returns None when the analysis
    is unavailable (never raises — FLOPs are best-effort metadata)."""
    try:
        def fwd(variables, images):
            return model.apply(variables, images, train=False)

        dummy = jnp.zeros((1, img_h, img_w, 3), jnp.float32)
        cost = jax.jit(fwd).lower(variables, dummy).cost_analysis()
        if cost is None:
            # Some PJRT backends (the tunneled TPU runtime among them) do
            # not implement cost analysis; re-lower abstractly on the host
            # CPU backend — FLOPs are backend-independent.
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
                variables,
            )
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                cost = jax.jit(fwd).lower(abstract, dummy).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops / 1e9 if flops > 0 else None
    except Exception:
        return None


import functools


@functools.partial(jax.jit, static_argnames=("max_det", "score_threshold"))
def _topk_select(boxes, scores, max_det: int, score_threshold: float):
    """NMS-free selection (DETR family): per image, top-max_det by score."""
    from ..ops.nms import NmsResult

    k = min(max_det, scores.shape[-1])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    valid = top_scores > score_threshold
    classes = jnp.where(valid, 0, -1).astype(jnp.int32)
    return NmsResult(
        jnp.where(valid[..., None], top_boxes, 0.0),
        jnp.where(valid, top_scores, 0.0),
        classes,
        valid,
    )


def evaluate_detector(
    loader,
    infer_fn: Callable,
    *,
    iou_threshold: float = 0.7,
    score_threshold: float = 0.001,
    max_det: int = 300,
    gt_from_batch: bool = True,
    compute_curves: bool = True,
    use_nms: bool = True,
) -> "Dict[str, Any]":
    """Run eval over a loader; returns the reference-schema metrics dict.

    ``loader`` yields dicts with ``image`` (B,H,W,3 u8), ``gt_boxes``,
    ``gt_mask``, ``batch_valid`` (from :class:`DetectionLoader` with
    ``drop_last=False``).
    """
    det_boxes, det_scores, gt_boxes_all = [], [], []
    t_pre = t_inf = t_post = 0.0
    n_images = 0
    t_mark = time.perf_counter()

    # Stage boundaries are synchronized by fetching a scalar to host:
    # block_until_ready does not actually synchronize on tunneled TPU
    # runtimes, which would mis-attribute stage times.
    yuv_convert = None
    for batch in loader:
        if "y" in batch:  # store="yuv420" loader: finish decode on device
            if yuv_convert is None:
                from ..ops.preprocess import yuv420_to_rgb_u8

                yuv_convert = jax.jit(yuv420_to_rgb_u8)
            images = yuv_convert(
                jax.device_put(batch["y"]),
                jax.device_put(batch["cb"]),
                jax.device_put(batch["cr"]),
            )
        else:
            images = jax.device_put(batch["image"])
        float(jnp.asarray(images[0, 0, 0, 0], jnp.float32))
        now = time.perf_counter()
        t_pre += now - t_mark
        t_mark = now

        ctx = batch.get("solar_bin")
        boxes, scores = (
            infer_fn(images, jax.device_put(ctx)) if ctx is not None else infer_fn(images)
        )
        float(scores[0, 0])
        now = time.perf_counter()
        t_inf += now - t_mark
        t_mark = now

        if use_nms:
            nms = batched_nms(
                boxes,
                scores,
                iou_threshold=iou_threshold,
                score_threshold=score_threshold,
                max_det=max_det,
            )
        else:
            # NMS-free (DETR family): top-max_det by score.
            nms = _topk_select(boxes, scores, max_det, score_threshold)
        float(nms.scores[0, 0])
        now = time.perf_counter()
        t_post += now - t_mark

        nms_boxes = np.asarray(nms.boxes)
        nms_scores = np.asarray(nms.scores)
        nms_valid = np.asarray(nms.valid)
        watchdog.beat("eval batch")
        valid_rows = np.asarray(batch.get("batch_valid", np.ones(len(nms_boxes), bool)))
        gtb = np.asarray(batch["gt_boxes"]) if gt_from_batch else None
        gtm = np.asarray(batch["gt_mask"]) if gt_from_batch else None

        for i in range(nms_boxes.shape[0]):
            if not valid_rows[i]:
                continue
            keep = nms_valid[i]
            det_boxes.append(nms_boxes[i][keep])
            det_scores.append(nms_scores[i][keep])
            if gt_from_batch:
                gt_boxes_all.append(gtb[i][gtm[i]])
            n_images += 1
        t_mark = time.perf_counter()

    metrics: "Dict[str, Any]" = {}
    if gt_from_batch and n_images:
        coco = evaluate_detections(
            det_boxes, det_scores, gt_boxes_all, compute_curves=compute_curves
        )
        metrics.update(coco.to_metrics_dict())

    if n_images:
        metrics["speed_preprocess_ms_per_img"] = 1000.0 * t_pre / n_images
        metrics["speed_inference_ms_per_img"] = 1000.0 * t_inf / n_images
        metrics["speed_postprocess_ms_per_img"] = 1000.0 * t_post / n_images
    metrics["n_images"] = n_images
    return metrics
