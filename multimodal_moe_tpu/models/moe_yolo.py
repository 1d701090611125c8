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
from ..quant import QT, absmax_sow_kwargs, q_from_images, quantize_to
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
    # PTQ serving: int8 trunk (backbone/neck/head convs) + w8a8 expert FFNs
    # (dropless int8 sweep, per-expert weight scales); the fp32 routers and
    # the residual/combine stay fp. Serving variables =
    # {'quant': ..., 'params': ...} via quant.merge_serving_variables.
    int8: bool = False
    int8_fp_box: bool = False  # int8 trunk, fp DFL box branch (DetectHead.fp_box)
    remat: bool = False  # rematerialize backbone+neck stages (HBM ↔ recompute)

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
        if self.int8:
            images = q_from_images(images)
        feats = Backbone(**kw, arch=self.arch, remat=self.remat, name="backbone")(images, train)
        feats = PANNeck(**kw, arch=self.arch, remat=self.remat, name="neck")(feats, train)

        aux_total = jnp.zeros((), jnp.float32)
        expert_loads = []
        moe_feats = []
        for i, f in enumerate(feats):
            if isinstance(f, QT):
                # w8a8 MoE: the neck's int8 codes flow straight into the
                # expert sweep (moe.py moe_apply_sweep_int8); only the fp32
                # router dequantizes.
                bb, h, w, c = f.q.shape
                tokens = QT(f.q.reshape(bb * h * w, c), f.s)
            else:
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
            out_map = out_tokens.reshape(bb, h, w, c)
            if isinstance(f, QT):
                # requantize the fp MoE output for the int8 head
                s_moe = self.variable(
                    "quant", f"s_moe_out_{i}", lambda: jnp.ones((), jnp.float32)
                )
                out_map = QT(
                    quantize_to(out_map.astype(jnp.float32), s_moe.value),
                    s_moe.value,
                )
            elif not self.is_initializing():
                self.sow(
                    "qcal", f"moe_out{i}_absmax",
                    jnp.max(jnp.abs(out_map)).astype(jnp.float32),
                    **absmax_sow_kwargs(),
                )
            moe_feats.append(out_map)
            aux_total = aux_total + aux["moe_aux_loss"]
            expert_loads.append(aux["expert_load"])

        box_maps, cls_maps = DetectHead(
            num_classes=self.num_classes, fp_box=self.int8_fp_box, **kw,
            name="head",
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
