"""ResNet family in Flax (NHWC): the classification baseline's ResNet-50
(ref: scripts/train_vision_baseline.py:115-122 uses torchvision resnet50
from scratch) and the ResNet-vd variant RT-DETR uses as its backbone
(ref: third-party RT-DETRv2 r50vd configs, rtdetr_thirdparty.py:30-35).

The -vd deep-stem tweaks (3×3×3 stem, stride-2 moved to the 3×3 conv,
avg-pool downsample shortcut) matter for detection accuracy parity; the
vanilla variant keeps the classification baseline comparable to torchvision.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..quant import QT, absmax_sow_kwargs, quantize_to

Dtype = Any


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        if isinstance(x, QT):
            # int8 serving branch (PTQ — quant.py): BatchNorm (eps 1e-5 here,
            # vs 1e-3 in layers.ConvBNAct — the fold dispatches on the module
            # naming) is folded into the int8 weights offline; the fp32
            # epilogue (dequant + bias + ReLU + requant) fuses into the conv
            # so the tensor materialized in HBM is int8.
            k = self.kernel
            cin = x.q.shape[-1]
            w_q = self.variable(
                "quant", "w_q",
                lambda: jnp.zeros((k, k, cin, self.features), jnp.int8),
            )
            s_w = self.variable(
                "quant", "s_w", lambda: jnp.ones((self.features,), jnp.float32)
            )
            b = self.variable(
                "quant", "b", lambda: jnp.zeros((self.features,), jnp.float32)
            )
            s_out = self.variable(
                "quant", "s_out", lambda: jnp.ones((), jnp.float32)
            )
            y32 = lax.conv_general_dilated(
                x.q, w_q.value,
                (self.strides, self.strides),
                ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            from .layers import apply_i8_epilogue

            q = apply_i8_epilogue(
                y32, x.s * s_w.value, b.value, self.act, s_out.value,
                act_kind="relu",
            )
            return QT(q, s_out.value)

        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)
        y = nn.relu(x) if self.act else x
        # PTQ calibration statistic (stored only under mutable=['qcal'];
        # skipped during init so train state never grows a qcal collection).
        if not self.is_initializing():
            self.sow(
                "qcal", "out_absmax",
                jnp.max(jnp.abs(y)).astype(jnp.float32),
                **absmax_sow_kwargs(),
            )
        return y


class BottleneckBlock(nn.Module):
    features: int  # bottleneck width; output is 4×
    strides: int = 1
    vd: bool = False
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        out_ch = self.features * 4
        residual = x
        quant = isinstance(x, QT)
        in_ch = x.q.shape[-1] if quant else x.shape[-1]

        y = _ConvBN(self.features, 1, 1, **kw)(x, train)
        y = _ConvBN(self.features, 3, self.strides, **kw)(y, train)
        y = _ConvBN(out_ch, 1, 1, act=False, **kw)(y, train)

        if in_ch != out_ch or self.strides != 1:
            if self.vd and self.strides != 1:
                # -vd: avg-pool then 1×1 (keeps information the strided 1×1 drops)
                if quant:
                    # avg-pool is linear: pool the codes in fp32 and round
                    # back at the unchanged scale (avg ≤ max, so the input
                    # scale covers the output range; ≤0.5 LSB rounding error).
                    pooled = nn.avg_pool(
                        residual.q.astype(jnp.float32), (2, 2),
                        strides=(2, 2), padding="SAME",
                    )
                    residual = QT(
                        jnp.clip(jnp.round(pooled), -127, 127).astype(jnp.int8),
                        residual.s,
                    )
                else:
                    residual = nn.avg_pool(
                        residual, (2, 2), strides=(2, 2), padding="SAME"
                    )
                residual = _ConvBN(out_ch, 1, 1, act=False, **kw)(residual, train)
            else:
                residual = _ConvBN(out_ch, 1, self.strides, act=False, **kw)(
                    residual, train
                )
        if quant:
            s_add = self.variable(
                "quant", "s_add_0", lambda: jnp.ones((), jnp.float32)
            )
            z = nn.relu(
                y.q.astype(jnp.float32) * y.s
                + residual.q.astype(jnp.float32) * residual.s
            )
            return QT(quantize_to(z, s_add.value), s_add.value)
        out = nn.relu(y + residual)
        if not self.is_initializing():
            self.sow(
                "qcal", "add0_absmax",
                jnp.max(jnp.abs(out)).astype(jnp.float32),
                **absmax_sow_kwargs(),
            )
        return out


class ResNet(nn.Module):
    """ResNet-{18..152} trunk. ``num_classes=None`` → return the four stage
    feature maps (detection backbone mode, strides 4/8/16/32)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50
    width: int = 64
    num_classes: "int | None" = 1000
    vd: bool = False
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None
    # Rematerialize each bottleneck block on the backward pass instead of
    # holding its internals: the /4 and /8 stages at detector resolutions
    # are multi-GB of bf16 activations per block at protocol batch sizes —
    # the classic TPU trade of HBM for recompute FLOPs.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        if self.vd:
            # deep stem: three 3×3 convs
            x = _ConvBN(self.width // 2, 3, 2, **kw)(x, train)
            x = _ConvBN(self.width // 2, 3, 1, **kw)(x, train)
            x = _ConvBN(self.width, 3, 1, **kw)(x, train)
        else:
            x = _ConvBN(self.width, 7, 2, **kw)(x, train)
        if isinstance(x, QT):
            # max-pool is monotone: pool the int8 codes, scale unchanged
            x = QT(
                nn.max_pool(x.q, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))),
                x.s,
            )
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = (
            nn.remat(BottleneckBlock, static_argnums=(2,)) if self.remat
            else BottleneckBlock
        )
        feats = []
        block_idx = 0  # explicit names keep param paths identical with and
        # without remat (nn.remat's auto-name is "CheckpointBottleneckBlock"),
        # so checkpoints are interchangeable across the two modes.
        for i, n_blocks in enumerate(self.stage_sizes):
            width = self.width * (2**i)
            for j in range(n_blocks):
                strides = 2 if (j == 0 and i > 0) else 1
                x = block_cls(
                    width, strides=strides, vd=self.vd,
                    name=f"BottleneckBlock_{block_idx}", **kw
                )(x, train)
                block_idx += 1
            feats.append(x)

        if self.num_classes is None:
            return feats
        if isinstance(x, QT):
            x = x.q.astype(jnp.float32) * x.s
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def resnet50(num_classes: "int | None" = 1000, vd: bool = False, **kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes, vd=vd, **kw)


def resnet18(num_classes: "int | None" = 1000, **kw) -> ResNet:
    # 18 uses basic blocks in the original; bottleneck at these sizes is a
    # close, cheaper stand-in used only for smoke-scale tests.
    return ResNet(stage_sizes=(2, 2, 2, 2), num_classes=num_classes, **kw)
