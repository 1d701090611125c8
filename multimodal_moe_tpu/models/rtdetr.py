"""RT-DETR detector, TPU-native (Flax): ResNet-vd backbone, hybrid encoder
(AIFI + CCFF), multi-scale deformable-attention decoder with iterative box
refinement and IoU-aware query selection.

The reference runs this family through Ultralytics RT-DETR and the official
RT-DETRv2 repo out-of-process (ref: src/models/vision/rtdetr.py:77-95,
rtdetr_thirdparty.py:122-129, pinned lyuwenyu/RT-DETR@156ad82). This is the
first-party equivalent with the architecture expressed as static-shape XLA:

* AIFI — one standard transformer encoder layer on the stride-32 map only
  (858 tokens at 704×1248): plain MHA is MXU-friendly at this size
* CCFF — top-down/bottom-up cross-scale conv fusion (CSP blocks)
* decoder — 300 queries; per layer: query self-attention, multi-scale
  deformable cross-attention (ops/deformable.py), FFN; boxes refined in
  inverse-sigmoid space layer by layer
* NMS-free: predictions come straight from the final layer (the locked
  protocol's NMS applies to the YOLO family; DETR eval uses top-k scores,
  ref: notes/experiment_protocol_camera.md:83-86)
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.deformable import ms_deformable_attention
from ..ops.deformable_pallas import ms_deformable_attention_pallas
from ..quant import QT, absmax_sow_kwargs, dequantize, q_from_images, qcat, quantize_to
from .layers import CSPStage, ConvBNAct, MLP
from .resnet import ResNet


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """(H·W, dim) fixed 2D sine-cosine positional embedding (host-side,
    folded to a compile-time constant under jit)."""
    assert dim % 4 == 0
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    quarter = dim // 4
    omega = 1.0 / (temperature ** (np.arange(quarter) / quarter))
    out = []
    for grid in (xs, ys):
        ang = grid.reshape(-1)[:, None] * omega[None]
        out += [np.sin(ang), np.cos(ang)]
    return np.concatenate(out, axis=1).astype(np.float32)


class EncoderLayer(nn.Module):
    """Standard pre-activation-free transformer encoder layer (AIFI)."""

    dim: int
    num_heads: int = 8
    ffn_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        q = k = x + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn"
        )(q, k, x)
        x = nn.LayerNorm(dtype=self.dtype)(x + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
        y = nn.Dense(self.dim, dtype=self.dtype)(nn.gelu(y))
        return nn.LayerNorm(dtype=self.dtype)(x + y)


class HybridEncoder(nn.Module):
    """AIFI on the top level + CCFF cross-scale fusion → 3 maps at hidden_dim."""

    hidden_dim: int = 256
    num_heads: int = 8
    dtype: Any = jnp.float32
    axis_name: "str | None" = None
    # "tpu": CCFF fusion stages are full-width PlainStages — CSP's
    # half-width split runs the /8 stage at ~6 TF/s on v5e (36 ms encoder
    # fwd at B4); full-width 3×3 convs run 46-96 TF/s. "csp" for ablation.
    arch: str = "tpu"

    @nn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        quant = isinstance(feats[0], QT)
        if self.arch == "tpu":
            from .layers import PlainStage

            def fuse(name):
                return PlainStage(self.hidden_dim, 2, shortcut=False, **kw, name=name)
        else:
            def fuse(name):
                return CSPStage(self.hidden_dim, 3, shortcut=False, **kw, name=name)
        # 1×1 input projections to the common width.
        proj = [
            ConvBNAct(self.hidden_dim, 1, act=False, **kw, name=f"in_proj{i}")(f, train)
            for i, f in enumerate(feats)
        ]

        # AIFI on the stride-32 map — an fp island in the int8 serving graph
        # (attention/LayerNorm/GELU epilogues are not int8-friendly, and the
        # stride-32 map is the cheapest level); dequantize in, requantize out
        # with a calibrated static scale so the CCFF below stays int8.
        p5_in = proj[2]
        if quant:
            p5_in = dequantize(p5_in).astype(self.dtype)
        b, h5, w5, c = p5_in.shape
        tokens = p5_in.reshape(b, h5 * w5, c)
        pos = jnp.asarray(sincos_2d(h5, w5, c))[None]
        tokens = EncoderLayer(
            dim=c, num_heads=self.num_heads, ffn_dim=self.hidden_dim * 4,
            dtype=self.dtype, name="aifi",
        )(tokens, pos)
        p5 = tokens.reshape(b, h5, w5, c)
        if quant:
            s_aifi = self.variable(
                "quant", "s_aifi_0", lambda: jnp.ones((), jnp.float32)
            )
            p5 = QT(quantize_to(p5.astype(jnp.float32), s_aifi.value), s_aifi.value)
        elif not self.is_initializing():
            self.sow(
                "qcal", "aifi0_absmax",
                jnp.max(jnp.abs(p5)).astype(jnp.float32),
                **absmax_sow_kwargs(),
            )

        # CCFF: top-down then bottom-up.
        from .layers import upsample2x

        cat = qcat if quant else (lambda xs: jnp.concatenate(xs, -1))
        td4 = fuse("td4")(cat([upsample2x(p5), proj[1]]), train)
        td3 = fuse("td3")(cat([upsample2x(td4), proj[0]]), train)
        bu4 = fuse("bu4")(
            cat([ConvBNAct(self.hidden_dim, 3, strides=2, **kw, name="down3")(td3, train), td4]),
            train,
        )
        bu5 = fuse("bu5")(
            cat([ConvBNAct(self.hidden_dim, 3, strides=2, **kw, name="down4")(bu4, train), p5]),
            train,
        )
        return [td3, bu4, bu5]


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention module (projections around the
    sampling core in ops/deformable.py)."""

    dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dtype: Any = jnp.float32
    # "auto": Pallas kernel on TPU (7.2/12.5 ms fwd/train vs XLA's
    # 17.4/95 ms per layer at B4 — docs/performance.md), XLA elsewhere.
    sampling_kernel: str = "auto"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,              # (B, Q, dim)
        reference_points: jnp.ndarray,   # (B, Q, 4) cxcywh normalized
        values: jnp.ndarray,             # (B, sum_HW, dim)
        level_shapes: "Sequence[Tuple[int, int]]",
    ) -> jnp.ndarray:
        b, q, _ = query.shape
        head_dim = self.dim // self.num_heads
        n = self.num_heads * self.num_levels * self.num_points

        v = nn.Dense(self.dim, dtype=self.dtype, name="value_proj")(values)
        v = v.reshape(b, -1, self.num_heads, head_dim)

        offsets = nn.Dense(
            2 * n, dtype=self.dtype, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=_grid_init(self.num_heads, self.num_levels, self.num_points),
        )(query).reshape(b, q, self.num_heads, self.num_levels, self.num_points, 2)
        weights = nn.Dense(n, dtype=self.dtype, name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(b, q, self.num_heads, -1).astype(jnp.float32), axis=-1
        ).reshape(b, q, self.num_heads, self.num_levels, self.num_points)

        # Offsets scaled by the reference box size (RT-DETR convention).
        ctr = reference_points[..., None, None, None, 0:2]
        wh = reference_points[..., None, None, None, 2:4]
        loc = ctr + offsets.astype(jnp.float32) / self.num_points * wh * 0.5

        use_pallas = self.sampling_kernel == "pallas" or (
            self.sampling_kernel == "auto"
            and jax.devices()[0].platform == "tpu"
        )
        if use_pallas:
            out = ms_deformable_attention_pallas(
                v.astype(jnp.float32),
                tuple(tuple(s) for s in level_shapes),
                loc,
                weights,
            )
        else:
            out = ms_deformable_attention(
                v.astype(jnp.float32), level_shapes, loc, weights
            )
        return nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(
            out.astype(self.dtype)
        )


def _grid_init(num_heads: int, num_levels: int, num_points: int):
    """Reference-style directional init for sampling-offset biases."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(num_heads) * (2.0 * math.pi / num_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
        scale = np.arange(1, num_points + 1).reshape(1, 1, num_points, 1)
        return jnp.asarray((grid * scale).reshape(-1), dtype)

    return init


def build_denoising_queries(
    rng: jax.Array,
    gt_boxes: jnp.ndarray,   # (B, M, 4) cxcywh normalized
    gt_mask: jnp.ndarray,    # (B, M)
    *,
    num_groups: int = 2,
    num_matching: int,
    box_noise_scale: float = 1.0,
):
    """Contrastive denoising (CDN) query construction, static shapes.

    Per group, every GT slot yields a positive query (small box jitter — the
    decoder must reconstruct the GT) and a negative (large jitter — must
    predict background). Counterpart of RT-DETRv2's denoising branch.

    Returns (dn_ref (B, D, 4) in [0,1], dn_is_pos (D,) bool,
    attn_mask (D+Q, D+Q) bool with True = may attend), D = 2·groups·M.
    """
    b, m, _ = gt_boxes.shape
    d = 2 * num_groups * m

    k1, k2, k3 = jax.random.split(rng, 3)
    boxes = jnp.tile(gt_boxes[:, None], (1, 2 * num_groups, 1, 1))   # (B, 2G, M, 4)
    is_pos = (
        jnp.arange(2 * num_groups) % 2 == 0
    )                                                                 # (2G,)
    # positive: shift ∈ (−0.5, 0.5)·wh·scale; negative: ∈ ±(0.5, 1.0)·wh·scale
    shift_u = jax.random.uniform(k1, boxes[..., :2].shape, minval=-1.0, maxval=1.0)
    mag = jnp.where(
        is_pos[None, :, None, None], jnp.abs(shift_u) * 0.5, 0.5 + jnp.abs(shift_u) * 0.5
    )
    shift = jnp.sign(shift_u) * mag * boxes[..., 2:4] * box_noise_scale
    scale_u = jax.random.uniform(
        k2, boxes[..., 2:4].shape, minval=-0.5, maxval=0.5
    ) * box_noise_scale
    wh_scale = jnp.where(is_pos[None, :, None, None], 1.0 + 0.5 * scale_u, 1.0 + scale_u)
    ctr = boxes[..., 0:2] + shift
    wh = boxes[..., 2:4] * jnp.abs(wh_scale)
    dn = jnp.clip(jnp.concatenate([ctr, wh], -1), 1e-4, 1.0 - 1e-4)
    dn_ref = dn.reshape(b, d, 4)
    dn_is_pos = jnp.repeat(is_pos, m, total_repeat_length=d)          # (D,)

    # Attention mask (RT-DETRv2/DINO convention, asymmetric): matching
    # queries never see dn queries and dn groups never see each other, but
    # dn queries MAY attend to the matching queries.
    group_id = jnp.concatenate(
        [
            jnp.repeat(jnp.arange(num_groups), 2 * m, total_repeat_length=d),
            jnp.full((num_matching,), num_groups + 1),
        ]
    )
    is_match = group_id == num_groups + 1
    attn_mask = (group_id[:, None] == group_id[None, :]) | (
        (~is_match)[:, None] & is_match[None, :]
    )                                                                 # (T, T)
    return dn_ref, dn_is_pos, attn_mask


class DecoderLayer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, query_pos, reference_points, values, level_shapes,
                 attn_mask=None):
        q = k = query + query_pos
        mask = None
        if attn_mask is not None:
            mask = attn_mask[None, None]  # (1, 1, Q, Q) broadcast over B, heads
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn"
        )(q, k, query, mask=mask)
        query = nn.LayerNorm(dtype=self.dtype)(query + attn)

        cross = MSDeformAttn(
            dim=self.dim, num_heads=self.num_heads, num_levels=self.num_levels,
            num_points=self.num_points, dtype=self.dtype, name="cross_attn",
        )(query + query_pos, reference_points, values, level_shapes)
        query = nn.LayerNorm(dtype=self.dtype)(query + cross)

        y = nn.Dense(self.ffn_dim, dtype=self.dtype)(query)
        y = nn.Dense(self.dim, dtype=self.dtype)(nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype)(query + y)


class RTDETRDetector(nn.Module):
    """Full RT-DETR. Output dict matches the evaluator interface ("boxes" in
    absolute xyxy pixels + "cls_logits") plus DETR-native fields
    (pred_logits/pred_boxes/aux_outputs) for the Hungarian loss."""

    num_classes: int = 1
    hidden_dim: int = 256
    num_queries: int = 300
    num_decoder_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    num_denoising_groups: int = 2  # CDN groups; 0 disables denoising
    backbone_depths: "Tuple[int, ...]" = (3, 4, 6, 3)  # r50
    arch: str = "tpu"  # CCFF fusion-stage family ("tpu" | "csp")
    dtype: Any = jnp.float32
    axis_name: "str | None" = None
    remat: bool = False  # rematerialize backbone blocks (HBM ↔ recompute)
    # PTQ serving: int8 ResNet-vd backbone + int8 CCFF cross-scale fusion
    # (together ~3/4 of the conv FLOPs); the AIFI attention island and the
    # decoder stay fp. Serving variables = {'quant': ..., 'params': ...}
    # via quant.merge_serving_variables.
    int8: bool = False

    denoising_capable: bool = True  # trainer passes GT + a 'denoise' rng

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        train: bool = False,
        gt_boxes: "jnp.ndarray | None" = None,   # (B, M, 4) xyxy pixels (CDN)
        gt_mask: "jnp.ndarray | None" = None,    # (B, M)
    ) -> "Dict[str, Any]":
        b, img_h, img_w, _ = images.shape
        backbone = ResNet(
            stage_sizes=self.backbone_depths, num_classes=None, vd=True,
            dtype=self.dtype, axis_name=self.axis_name, remat=self.remat,
            name="backbone",
        )
        bb_in = q_from_images(images) if self.int8 else images
        c2, c3, c4, c5 = backbone(bb_in, train)
        # int8: the QT stage outputs flow straight into the CCFF (c2 is
        # unused at this scale set — dead code XLA removes); only the AIFI
        # island and everything from the decoder down run fp.
        feats = HybridEncoder(
            hidden_dim=self.hidden_dim, num_heads=self.num_heads,
            dtype=self.dtype, axis_name=self.axis_name, arch=self.arch,
            name="encoder",
        )([c3, c4, c5], train)
        if self.int8:
            feats = [
                f.q.astype(self.dtype) * f.s.astype(self.dtype) for f in feats
            ]

        level_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        memory = jnp.concatenate(
            [f.reshape(b, -1, self.hidden_dim) for f in feats], axis=1
        )  # (B, sum_HW, C)

        # --- IoU-aware query selection from encoder output ------------------
        enc_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="enc_score")(
            memory
        )
        enc_boxes_delta = MLP(
            self.hidden_dim, 4, num_layers=3, dtype=self.dtype, name="enc_bbox"
        )(memory)
        anchors, valid_mask = self._anchors(level_shapes)
        enc_boxes = jax.nn.sigmoid(enc_boxes_delta.astype(jnp.float32) + anchors[None])

        scores = jnp.max(enc_logits.astype(jnp.float32), -1)
        scores = jnp.where(valid_mask[None], scores, -1e9)
        _, topk = jax.lax.top_k(scores, self.num_queries)
        ref_boxes = jnp.take_along_axis(enc_boxes, topk[..., None], axis=1)  # (B,Q,4)
        enc_topk_logits = jnp.take_along_axis(
            enc_logits.astype(jnp.float32), topk[..., None], axis=1
        )                                                                    # (B,Q,nc)
        content = jnp.take_along_axis(memory, topk[..., None], axis=1)
        content = jax.lax.stop_gradient(content)
        ref_boxes_init = jax.lax.stop_gradient(ref_boxes)

        query = MLP(
            self.hidden_dim, self.hidden_dim, num_layers=2, dtype=self.dtype,
            name="query_proj",
        )(content)

        # --- contrastive denoising queries (training only) -------------------
        use_dn = (
            train
            and self.num_denoising_groups > 0
            and gt_boxes is not None
            and gt_mask is not None
            and self.has_rng("denoise")
        )
        # Created unconditionally so init (no GT) and train (GT) share params.
        dn_embed = self.param(
            "dn_content_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 1, self.hidden_dim),
            jnp.float32,
        )
        num_dn = 0
        dn_is_pos = None
        attn_mask = None
        if use_dn:
            scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
            gt_n = gt_boxes / scale
            gt_cxcywh = jnp.concatenate(
                [(gt_n[..., 0:2] + gt_n[..., 2:4]) / 2, gt_n[..., 2:4] - gt_n[..., 0:2]],
                axis=-1,
            )
            dn_ref, dn_is_pos, attn_mask = build_denoising_queries(
                self.make_rng("denoise"),
                jnp.clip(gt_cxcywh, 1e-4, 1 - 1e-4),
                gt_mask,
                num_groups=self.num_denoising_groups,
                num_matching=self.num_queries,
            )
            num_dn = dn_ref.shape[1]
            dn_query = jnp.tile(dn_embed.astype(self.dtype), (b, num_dn, 1))
            query = jnp.concatenate([dn_query, query], axis=1)
            ref_boxes_init = jnp.concatenate([dn_ref, ref_boxes_init], axis=1)

        # --- decoder with iterative refinement -------------------------------
        # ``ref`` carried across layers is detached (RT-DETRv2 convention):
        # each aux layer's box loss sees only its own delta through
        # ``ref_out``; the carried value is re-detached every iteration.
        aux_outputs = []
        dn_outputs = []
        ref = ref_boxes_init  # already stop_gradient'd (dn_ref is param-free)
        for li in range(self.num_decoder_layers):
            query_pos = MLP(
                self.hidden_dim, self.hidden_dim, num_layers=2, dtype=self.dtype,
                name=f"ref_embed{li}",
            )(ref.astype(self.dtype))
            query = DecoderLayer(
                dim=self.hidden_dim, num_heads=self.num_heads,
                num_levels=len(feats), num_points=self.num_points,
                dtype=self.dtype, name=f"decoder{li}",
            )(query, query_pos, ref, memory, level_shapes, attn_mask=attn_mask)

            delta = MLP(
                self.hidden_dim, 4, num_layers=3, dtype=self.dtype,
                name=f"bbox_head{li}",
            )(query)
            ref_out = jax.nn.sigmoid(
                delta.astype(jnp.float32) + inverse_sigmoid(ref)
            )
            logits = nn.Dense(
                self.num_classes, dtype=self.dtype, name=f"cls_head{li}",
                bias_init=nn.initializers.constant(-4.6),
            )(query)
            aux_outputs.append(
                {
                    "pred_logits": logits.astype(jnp.float32)[:, num_dn:],
                    "pred_boxes": ref_out[:, num_dn:],
                }
            )
            if num_dn:
                dn_outputs.append(
                    {
                        "pred_logits": logits.astype(jnp.float32)[:, :num_dn],
                        "pred_boxes": ref_out[:, :num_dn],
                    }
                )
            ref = jax.lax.stop_gradient(ref_out)

        final = aux_outputs[-1]
        scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        cxcywh = final["pred_boxes"] * scale
        boxes_xyxy = jnp.concatenate(
            [cxcywh[..., 0:2] - cxcywh[..., 2:4] / 2, cxcywh[..., 0:2] + cxcywh[..., 2:4] / 2],
            axis=-1,
        )
        out = {
            "pred_logits": final["pred_logits"],
            "pred_boxes": final["pred_boxes"],
            "aux_outputs": aux_outputs[:-1],
            # Encoder query-selection aux head: the top-k-gathered logits and
            # (undetached) boxes are matched as an extra loss layer so
            # enc_score/enc_bbox receive gradient (RT-DETRv2 recipe).
            "enc_outputs": {
                "pred_logits": enc_topk_logits,
                "pred_boxes": ref_boxes,
            },
            "boxes": boxes_xyxy,                    # (B, Q, 4) xyxy pixels
            "cls_logits": final["pred_logits"],     # evaluator interface
        }
        if num_dn:
            out["dn_outputs"] = dn_outputs
            out["dn_is_pos"] = dn_is_pos
            out["dn_groups"] = self.num_denoising_groups
        return out

    def _anchors(self, level_shapes, grid_size: float = 0.05):
        """Per-location anchor priors in inverse-sigmoid space (host numpy →
        compile-time constant)."""
        all_anchors = []
        valids = []
        for lvl, (h, w) in enumerate(level_shapes):
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            cx = (xs + 0.5) / w
            cy = (ys + 0.5) / h
            wh = np.full_like(cx, grid_size * (2.0**lvl))
            a = np.stack([cx, cy, wh, wh], -1).reshape(-1, 4)
            valid = ((a > 0.01) & (a < 0.99)).all(-1)
            a = np.clip(a, 0.01, 0.99)
            all_anchors.append(np.log(a / (1 - a)))
            valids.append(valid)
        return (
            jnp.asarray(np.concatenate(all_anchors).astype(np.float32)),
            jnp.asarray(np.concatenate(valids)),
        )


def rtdetr_loss(outputs, gt_labels, gt_boxes, gt_mask, *, img_hw=(704, 1248)):
    """DETR set loss incl. encoder auxiliary head."""
    from ..losses.hungarian import detr_loss

    return detr_loss(outputs, gt_labels, gt_boxes, gt_mask, img_hw=img_hw)
