"""MoE-routed YOLO detector: the context-routed multimodal detector the
reference was building toward (BASELINE.json configs 4-5; ref design notes:
notes/related_work.md:44-130).

Architecture: the dense YOLO trunk (CSP backbone + PAN neck) with a
context-routed MoE FFN block on each neck output level, then the standard
anchor-free head. Each spatial location is a token; every token of an image
shares the image's solar-context bin, which enters the router as an additive
bias — illumination regime steers expert choice (night experts vs high-sun
experts) while content still dominates.

Local-to-global fusion (ref notes :191-222) maps to the three feature levels
each owning their expert pool (stride-8 "local" through stride-32 "global").
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..data.solar import NUM_SOLAR_BINS
from .moe import MoEFFN
from .yolo import Backbone, DetectHead, PANNeck, REG_MAX, decode_boxes, make_anchors


class MoEYoloDetector(nn.Module):
    """YOLO trunk + per-level context-routed MoE FFN + detect head."""

    num_classes: int = 1
    variant: str = "s"
    num_experts: int = 4
    k: int = 2
    capacity_factor: float = 1.25
    dispatch: str = "auto"  # sparse above 4096 tokens (see MoEFFN)
    dtype: Any = jnp.float32
    axis_name: "str | None" = None
    arch: str = "tpu"

    context_aware: bool = True  # trainer passes context_ids when True

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        train: bool = False,
        context_ids: Optional[jnp.ndarray] = None,
    ) -> "Dict[str, jnp.ndarray]":
        b, img_h, img_w, _ = images.shape
        if context_ids is None:
            # "missing" bin when the caller has no context signal.
            context_ids = jnp.full((b,), NUM_SOLAR_BINS - 1, jnp.int32)

        kw = dict(variant=self.variant, dtype=self.dtype, axis_name=self.axis_name)
        feats = Backbone(**kw, arch=self.arch, name="backbone")(images, train)
        feats = PANNeck(**kw, arch=self.arch, name="neck")(feats, train)

        aux_total = jnp.zeros((), jnp.float32)
        expert_loads = []
        moe_feats = []
        for i, f in enumerate(feats):
            bb, h, w, c = f.shape
            tokens = f.reshape(bb * h * w, c)
            token_ctx = jnp.repeat(context_ids, h * w, total_repeat_length=bb * h * w)
            out_tokens, aux = MoEFFN(
                num_experts=self.num_experts,
                k=self.k,
                capacity_factor=self.capacity_factor,
                dispatch=self.dispatch,
                dtype=self.dtype,
                name=f"moe_level{i}",
            )(tokens, token_ctx)
            moe_feats.append(out_tokens.reshape(bb, h, w, c))
            aux_total = aux_total + aux["moe_aux_loss"]
            expert_loads.append(aux["expert_load"])

        box_maps, cls_maps = DetectHead(
            num_classes=self.num_classes, **kw, name="head"
        )(moe_feats, train)

        box_logits = jnp.concatenate(
            [m.reshape(b, -1, 4 * REG_MAX) for m in box_maps], axis=1
        )
        cls_logits = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_maps], axis=1
        )
        anchor_points, anchor_strides = make_anchors(img_h, img_w)
        boxes = decode_boxes(
            box_logits, jnp.asarray(anchor_points), jnp.asarray(anchor_strides)
        )
        return {
            "box_logits": box_logits.astype(jnp.float32),
            "cls_logits": cls_logits.astype(jnp.float32),
            "boxes": boxes,
            "anchor_points": jnp.asarray(anchor_points),
            "anchor_strides": jnp.asarray(anchor_strides),
            "moe_aux_loss": aux_total / len(feats),
            "expert_load": jnp.stack(expert_loads),  # (levels, E)
        }


def moe_yolo_loss(outputs, gt_labels, gt_boxes, gt_mask):
    """YOLO detection loss + MoE auxiliary losses."""
    from ..losses.tal import yolo_loss

    total, metrics = yolo_loss(outputs, gt_labels, gt_boxes, gt_mask)
    aux = outputs.get("moe_aux_loss")
    if aux is not None:
        total = total + aux
        metrics = dict(metrics)
        metrics["moe_aux_loss"] = aux
        metrics["loss"] = total
    return total, metrics
