"""TPU-native YOLO-class detector (Flax): CSP backbone, PAN neck, anchor-free
decoupled head with distribution-focal box regression.

Replaces the Ultralytics CUDA detector the reference wraps
(ref: src/models/vision/yolo.py:63-95 delegates everything to
``YOLO(cfg.model).train``). The architecture follows the modern anchor-free
YOLO recipe rather than any particular binary: it is what the locked
benchmark protocol needs (single pedestrian class, 1248×704 rectangular
input, NMS IoU 0.7 / max_det 300 — ref: notes/experiment_protocol_camera.md).

TPU-first choices:

* every tensor is NHWC with static shape; the three feature levels are kept
  as a list, never ragged
* decode is pure jnp (anchor grids are compile-time constants folded by XLA)
* reg_max=16 DFL: box sides predicted as softmax distributions over 16 bins —
  a (A, 16)×(16,) matmul, MXU-friendly
* variants n/s/m/l via (depth, width) multipliers, channel counts rounded to
  multiples of 8 (fp32 sublane)
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from jax import lax

from ..quant import QT, dequantize, q_from_images, qcat
from .layers import (
    CSPStage,
    ConvBNAct,
    PlainStage,
    SPPF,
    SpaceToDepthStem,
    upsample2x,
)


def _cat(xs):
    """Channel concat for fp arrays or quantized QTs alike."""
    return qcat(xs) if isinstance(xs[0], QT) else jnp.concatenate(xs, axis=-1)


def _up2(x):
    """2× nearest upsample; int8 codes upsample directly (pure reshape)."""
    return QT(upsample2x(x.q), x.s) if isinstance(x, QT) else upsample2x(x)

# (depth_multiple, width_multiple, max_channels)
VARIANTS: "Dict[str, Tuple[float, float, int]]" = {
    "n": (0.34, 0.25, 1024),
    "s": (0.34, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.0, 1.0, 512),
}

BASE_CHANNELS = (64, 128, 256, 512, 1024)
BASE_DEPTHS = (3, 6, 6, 3)
STRIDES = (8, 16, 32)
REG_MAX = 16


def _round8(x: float) -> int:
    return max(8, int(round(x / 8)) * 8)


def scaled_channels(variant: str) -> "list[int]":
    d, w, maxc = VARIANTS[variant]
    return [_round8(min(c, maxc) * w) for c in BASE_CHANNELS]


def scaled_depths(variant: str) -> "list[int]":
    d, _, _ = VARIANTS[variant]
    return [max(1, round(n * d)) for n in BASE_DEPTHS]


class _AutoNamer:
    """Reproduce flax's compact auto-naming (``ClassName_<i>`` with a
    per-class counter) so modules can be given *explicit* names that are
    byte-identical to the auto-assigned ones. Needed because wrapping a
    stage in ``nn.remat`` changes its auto-name ("CheckpointPlainStage_0"),
    which would fork the param tree — with explicit names, checkpoints are
    interchangeable between remat and non-remat modes (same trick as
    resnet.py:200-202)."""

    def __init__(self):
        self._counts: "Dict[str, int]" = {}

    def __call__(self, cls) -> str:
        base = cls.__name__
        i = self._counts.get(base, 0)
        self._counts[base] = i + 1
        return f"{base}_{i}"


def _stage_classes(remat: bool):
    """The five stage classes, optionally remat-wrapped (train=arg 2 is
    static). Rematerializing each stage on the backward pass is the classic
    TPU HBM-for-FLOPs trade: at 704×1248×B16 the /4 and /8 stages hold
    multi-GB of bf16 activations, which is exactly what pushed yolo-m +
    the HBM-resident data store (data/resident.py, ~5.3 GB) past the v5e's
    16 GB."""
    cs = (SpaceToDepthStem, PlainStage, CSPStage, ConvBNAct, SPPF)
    if not remat:
        return cs
    return tuple(nn.remat(c, static_argnums=(2,)) for c in cs)


class Backbone(nn.Module):
    """Backbone emitting strides 8/16/32 feature maps (P3, P4, P5).

    Two layouts:

    * ``arch="tpu"`` (default): space-to-depth stem straight to /4, then
      full-width PlainStages at /4 and /8 where CSP's narrow split runs at
      <10 TF/s on the MXU, CSP kept at /16 and /32 where it measures fine.
      Same stride/channel interface; measured v5e backbone time at
      704×1248×B16 drops ~27ms → ~12ms (docs/performance.md).
    * ``arch="csp"``: the classic two-strided-conv stem + CSP at every
      level (round-1 layout, kept for comparison/ablation).
    """

    variant: str = "s"
    dtype: Any = jnp.float32
    axis_name: "str | None" = None
    arch: str = "tpu"
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = scaled_channels(self.variant)
        depths = scaled_depths(self.variant)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        S2D, Plain, CSP, Conv, Sppf = _stage_classes(self.remat)
        nm = _AutoNamer()

        if self.arch == "tpu":
            x = S2D(ch[1], ratio=4, **kw, name=nm(SpaceToDepthStem))(x, train)  # /4
            x = Plain(ch[1], depths[0], **kw, name=nm(PlainStage))(x, train)
            x = Conv(ch[2], 3, strides=2, **kw, name=nm(ConvBNAct))(x, train)   # /8
            p3 = Plain(ch[2], depths[1], **kw, name=nm(PlainStage))(x, train)
        else:
            x = Conv(ch[0], 3, strides=2, **kw, name=nm(ConvBNAct))(x, train)   # /2
            x = Conv(ch[1], 3, strides=2, **kw, name=nm(ConvBNAct))(x, train)   # /4
            x = CSP(ch[1], depths[0], **kw, name=nm(CSPStage))(x, train)
            x = Conv(ch[2], 3, strides=2, **kw, name=nm(ConvBNAct))(x, train)   # /8
            p3 = CSP(ch[2], depths[1], **kw, name=nm(CSPStage))(x, train)
        x = Conv(ch[3], 3, strides=2, **kw, name=nm(ConvBNAct))(p3, train)      # /16
        p4 = CSP(ch[3], depths[2], **kw, name=nm(CSPStage))(x, train)
        x = Conv(ch[4], 3, strides=2, **kw, name=nm(ConvBNAct))(p4, train)      # /32
        x = CSP(ch[4], depths[3], **kw, name=nm(CSPStage))(x, train)
        p5 = Sppf(ch[4], **kw, name=nm(SPPF))(x, train)
        return [p3, p4, p5]


class PANNeck(nn.Module):
    """Top-down + bottom-up path aggregation over the three levels."""

    variant: str = "s"
    dtype: Any = jnp.float32
    axis_name: "str | None" = None
    arch: str = "tpu"
    remat: bool = False

    @nn.compact
    def __call__(self, feats: "list[jnp.ndarray]", train: bool = False):
        ch = scaled_channels(self.variant)
        depth = scaled_depths(self.variant)[3]
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        _, Plain, CSP, Conv, _ = _stage_classes(self.remat)
        nm = _AutoNamer()
        p3, p4, p5 = feats

        # top-down
        x = _cat([_up2(p5), p4])
        t4 = CSP(ch[3], depth, shortcut=False, **kw, name=nm(CSPStage))(x, train)
        x = _cat([_up2(t4), p3])
        # /8 is the hi-res level where CSP's narrow convs stall the MXU;
        # PlainStage's first 3×3 absorbs the 384→128 concat reduction.
        if self.arch == "tpu":
            n3 = Plain(ch[2], depth, shortcut=False, **kw, name=nm(PlainStage))(x, train)
        else:
            n3 = CSP(ch[2], depth, shortcut=False, **kw, name=nm(CSPStage))(x, train)

        # bottom-up
        x = Conv(ch[2], 3, strides=2, **kw, name=nm(ConvBNAct))(n3, train)
        x = _cat([x, t4])
        n4 = CSP(ch[3], depth, shortcut=False, **kw, name=nm(CSPStage))(x, train)
        x = Conv(ch[3], 3, strides=2, **kw, name=nm(ConvBNAct))(n4, train)
        x = _cat([x, p5])
        n5 = CSP(ch[4], depth, shortcut=False, **kw, name=nm(CSPStage))(x, train)
        return [n3, n4, n5]


class QPredConv(nn.Module):
    """int8 1×1 prediction conv: quantized weights, fp32 output (feeds
    decode/NMS directly — no requant). Declared under the *same module
    name* as the fp ``nn.Conv`` so the quant tree's paths mirror params."""

    features: int

    @nn.compact
    def __call__(self, x: QT):
        cin = x.q.shape[-1]
        w_q = self.variable(
            "quant", "w_q", lambda: jnp.zeros((1, 1, cin, self.features), jnp.int8)
        )
        s_w = self.variable(
            "quant", "s_w", lambda: jnp.ones((self.features,), jnp.float32)
        )
        b = self.variable(
            "quant", "b", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        y32 = lax.conv_general_dilated(
            x.q, w_q.value, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y32.astype(jnp.float32) * (x.s * s_w.value) + b.value


class DetectHead(nn.Module):
    """Anchor-free decoupled head: per level, a box branch (4×REG_MAX DFL
    logits) and a class branch (num_classes logits)."""

    num_classes: int = 1
    variant: str = "s"
    dtype: Any = jnp.float32
    axis_name: "str | None" = None
    # int8 serving refinement: run the DFL box-regression branch in fp while
    # the trunk/neck/cls stay int8. Motivated by the hard-corpus PTQ finding
    # (BASELINE.md round 4): avgmax calibration recovers the detection-level
    # mAP50 loss but none of the strict-IoU mAP50-95 loss — the residual is
    # activation rounding in the box-logit path, which this removes at the
    # cost of 6 fp 3×3 convs. The fp branch reads 'params'/'batch_stats'
    # (present via quant.merge_serving_variables), so the quant npz built
    # for the full-int8 model keeps working as a superset.
    fp_box: bool = False

    @nn.compact
    def __call__(self, feats: "list[jnp.ndarray]", train: bool = False):
        ch = scaled_channels(self.variant)
        box_ch = max(16, ch[2] // 4, 4 * REG_MAX)
        cls_ch = max(ch[2], min(self.num_classes, 100))
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)

        box_out, cls_out = [], []
        for i, f in enumerate(feats):
            fb = (
                dequantize(f).astype(self.dtype)
                if self.fp_box and isinstance(f, QT)
                else f
            )
            b = ConvBNAct(box_ch, 3, **kw, name=f"box{i}_conv1")(fb, train)
            b = ConvBNAct(box_ch, 3, **kw, name=f"box{i}_conv2")(b, train)
            if isinstance(b, QT):
                b = QPredConv(4 * REG_MAX, name=f"box{i}_pred")(b)
            else:
                b = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype, name=f"box{i}_pred")(b)
            c = ConvBNAct(cls_ch, 3, **kw, name=f"cls{i}_conv1")(f, train)
            c = ConvBNAct(cls_ch, 3, **kw, name=f"cls{i}_conv2")(c, train)
            if isinstance(c, QT):
                c = QPredConv(self.num_classes, name=f"cls{i}_pred")(c)
            else:
                c = nn.Conv(
                    self.num_classes, (1, 1), dtype=self.dtype,
                    bias_init=nn.initializers.constant(-4.6),  # prior p≈0.01
                    name=f"cls{i}_pred",
                )(c)
            box_out.append(b)
            cls_out.append(c)
        return box_out, cls_out


def make_anchors(
    img_h: int, img_w: int, strides: Sequence[int] = STRIDES
) -> "Tuple[np.ndarray, np.ndarray]":
    """Anchor centers (A, 2) in pixels + per-anchor stride (A, 1).

    Host-side numpy: anchors depend only on static shapes, so under jit they
    are compile-time constants.
    """
    points, stride_list = [], []
    for s in strides:
        h, w = img_h // s, img_w // s
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pts = np.stack([(xs + 0.5) * s, (ys + 0.5) * s], axis=-1).reshape(-1, 2)
        points.append(pts)
        stride_list.append(np.full((pts.shape[0], 1), s, dtype=np.float32))
    return (
        np.concatenate(points).astype(np.float32),
        np.concatenate(stride_list).astype(np.float32),
    )


def dfl_expectation(box_logits: jnp.ndarray) -> jnp.ndarray:
    """(..., 4*REG_MAX) DFL logits → (..., 4) expected ltrb distances (in
    stride units) via softmax expectation.

    Written as explicit exp + two weighted-sum reductions rather than
    ``softmax(x) @ bins``: the (…, 16) @ (16,) matvec is a dot op XLA
    cannot fuse its producer into, so the softmax probabilities
    materialize in HBM — at the B128 serving batch that buffer is
    f32[128, 18018, 4, 16] = 590 MB and showed up as ~5 ms of
    ``pad_maximum``+kin fusions in the round-4 int8 trace
    (docs/performance.md). The reduction form fuses exp/mul/sum into one
    loop fusion over the bf16 head output; same math (sum(e·b)/sum(e) ==
    sum((e/sum(e))·b)) up to fp rounding order."""
    shape = box_logits.shape[:-1] + (4, REG_MAX)
    x = box_logits.reshape(shape).astype(jnp.float32)
    e = jnp.exp(x - jnp.max(x, axis=-1, keepdims=True))
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.sum(e * bins, axis=-1) / jnp.sum(e, axis=-1)


def decode_boxes(
    box_logits: jnp.ndarray, anchor_points: jnp.ndarray, anchor_strides: jnp.ndarray
) -> jnp.ndarray:
    """(B, A, 4*REG_MAX) logits + anchors → (B, A, 4) xyxy pixel boxes."""
    ltrb = dfl_expectation(box_logits) * anchor_strides  # pixels
    x1y1 = anchor_points - ltrb[..., 0:2]
    x2y2 = anchor_points + ltrb[..., 2:4]
    return jnp.concatenate([x1y1, x2y2], axis=-1)


class YoloDetector(nn.Module):
    """Full detector. ``__call__`` returns flattened per-anchor raw outputs
    (for the loss) plus decoded boxes/scores (for inference/NMS)."""

    num_classes: int = 1
    variant: str = "s"
    dtype: Any = jnp.float32
    axis_name: "str | None" = None
    arch: str = "tpu"
    int8: bool = False  # PTQ serving mode: needs the 'quant' collection (quant.py)
    int8_fp_box: bool = False  # int8 trunk, fp DFL box branch (DetectHead.fp_box)
    remat: bool = False  # rematerialize backbone+neck stages (HBM ↔ recompute)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> "Dict[str, jnp.ndarray]":
        b, img_h, img_w, _ = images.shape
        kw = dict(variant=self.variant, dtype=self.dtype, axis_name=self.axis_name)
        if self.int8:
            # Normalized [0,1] input → int8 codes at the static scale 1/127;
            # from here every inter-layer activation is int8 (see quant.py).
            images = q_from_images(images)
        feats = Backbone(**kw, arch=self.arch, remat=self.remat, name="backbone")(images, train)
        feats = PANNeck(**kw, arch=self.arch, remat=self.remat, name="neck")(feats, train)
        box_maps, cls_maps = DetectHead(
            num_classes=self.num_classes, fp_box=self.int8_fp_box, **kw,
            name="head",
        )(feats, train)

        box_logits = jnp.concatenate(
            [m.reshape(b, -1, 4 * REG_MAX) for m in box_maps], axis=1
        )
        cls_logits = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_maps], axis=1
        )

        anchor_points, anchor_strides = make_anchors(img_h, img_w)
        # Decode PER LEVEL, then concat the (B, A, 4) boxes: identical math
        # (DFL softmax is per-anchor), but the serving graph never
        # materializes the (B, A, 64) fp32 logit concat — at B128/18018
        # anchors that intermediate alone is 590 MB (xplane: a 3.5 ms
        # pad_maximum plus siblings). The 64-wide concat above survives only
        # in the training graph (the loss reads it); XLA DCEs it in serving.
        lvl_boxes = []
        off = 0
        for m in box_maps:
            lg = m.reshape(b, -1, 4 * REG_MAX)
            n = lg.shape[1]
            lvl_boxes.append(
                decode_boxes(
                    lg,
                    jnp.asarray(anchor_points[off : off + n]),
                    jnp.asarray(anchor_strides[off : off + n]),
                )
            )
            off += n
        boxes = jnp.concatenate(lvl_boxes, axis=1)
        return {
            "box_logits": box_logits.astype(jnp.float32),   # (B, A, 64)
            "cls_logits": cls_logits.astype(jnp.float32),   # (B, A, nc)
            "boxes": boxes,                                  # (B, A, 4) xyxy px
            "anchor_points": jnp.asarray(anchor_points),     # (A, 2)
            "anchor_strides": jnp.asarray(anchor_strides),   # (A, 1)
        }


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
