"""Shared building blocks for the detector zoo (Flax linen, NHWC, bf16-first).

The reference consumes these architectures from Ultralytics binaries
(SURVEY.md §2b); here they are first-party. Conventions chosen for the MXU:

* NHWC layout — XLA's native conv layout on TPU
* compute dtype configurable (bf16 default at call sites), params fp32
* BatchNorm with ``axis_name``-aware cross-replica sync for data-parallel
  training; folds into the conv at inference
* SiLU activations; channel counts kept multiples of 8 (sublane) where the
  width multiplier allows
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..quant import QT, absmax_sow_kwargs, q_split2, qcat, quantize_to


def apply_i8_epilogue(y32, scale, bias, act: bool, s_out, act_kind: str = "silu") -> jnp.ndarray:
    """The int8 conv epilogue: dequant → (SiLU) → requant, fused by XLA into
    the conv. The xplane trace of the B128 serving graph puts 55.5 of
    84.8 ms inside these conv+epilogue fusions vs a ~29 ms int8 MXU roof —
    the VPU elementwise chain is the wall (docs/performance.md round-4).

    ``MMOE_I8_EPILOGUE`` selects the variant (read at trace time):
      bf16   — dequant+SiLU in bf16, requant from fp32 (DEFAULT: measured
               B128 serving 85.2 -> 72.7 ms, +17%; the bf16 mantissa's
               ≤1-quant-step perturbation is inside int8 noise —
               tests/test_quant.py::test_bf16_epilogue_within_quant_noise)
      silu   — exact fp32 SiLU (matches the fp model bit-for-bit up to
               requant rounding; the accuracy reference)
      hswish — hard-SiLU x·relu6(x+3)/6 (≤0.07 abs error around |x|≈3;
               cheap polynomial-free epilogue — accuracy must be re-checked
               per checkpoint before serving with it)
      linear — no activation (perf lower bound only; NOT a serving mode)
    """
    mode = os.environ.get("MMOE_I8_EPILOGUE", "bf16")
    if mode == "bf16":
        y = y32.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16) + bias.astype(
            jnp.bfloat16
        )
        if act:
            y = nn.relu(y) if act_kind == "relu" else y * nn.sigmoid(y)
        return quantize_to(y.astype(jnp.float32), s_out)
    y = y32.astype(jnp.float32) * scale + bias
    if act:
        if act_kind == "relu":
            y = nn.relu(y)
        elif mode == "hswish":
            y = y * jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0)
        elif mode == "linear":
            pass
        else:
            y = y * nn.sigmoid(y)
    return quantize_to(y, s_out)

Dtype = Any


def autopad(k: int, d: int = 1) -> int:
    """'same' padding for odd kernel sizes with dilation."""
    k_eff = d * (k - 1) + 1
    return k_eff // 2


class ConvBNAct(nn.Module):
    """Conv → BatchNorm → SiLU, the universal detector block."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.kernel_size)
        if isinstance(x, QT):
            # int8 serving branch (PTQ — see quant.py): BN is folded into
            # the int8 weights offline; the fp32 epilogue (dequant + bias +
            # SiLU + requant) fuses into the conv so the tensor materialized
            # in HBM is int8.
            k = self.kernel_size
            cin = x.q.shape[-1]
            w_q = self.variable(
                "quant", "w_q",
                lambda: jnp.zeros((k, k, cin // self.groups, self.features), jnp.int8),
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
                feature_group_count=self.groups,
                preferred_element_type=jnp.int32,
            )
            q = apply_i8_epilogue(
                y32, x.s * s_w.value, b.value, self.act, s_out.value
            )
            return QT(q, s_out.value)

        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
        y = nn.silu(x) if self.act else x
        # Calibration statistic for PTQ (stored only when a caller passes
        # mutable=['qcal']; dead code XLA removes otherwise; skipped during
        # init so checkpoints/train state never grow a qcal collection).
        if not self.is_initializing():
            self.sow(
                "qcal", "out_absmax",
                jnp.max(jnp.abs(y)).astype(jnp.float32),
                **absmax_sow_kwargs(),
            )
        return y


class Bottleneck(nn.Module):
    """Two 3×3 convs with optional residual."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBNAct(hidden, 3, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        y = ConvBNAct(self.features, 3, dtype=self.dtype, axis_name=self.axis_name)(y, train)
        if isinstance(x, QT):
            if self.shortcut and x.q.shape[-1] == self.features:
                s_add = self.variable(
                    "quant", "s_add_0", lambda: jnp.ones((), jnp.float32)
                )
                z = x.q.astype(jnp.float32) * x.s + y.q.astype(jnp.float32) * y.s
                y = QT(quantize_to(z, s_add.value), s_add.value)
            return y
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
            if not self.is_initializing():
                self.sow(
                    "qcal", "add0_absmax",
                    jnp.max(jnp.abs(y)).astype(jnp.float32),
                    **absmax_sow_kwargs(),
                )
        return y


class CSPStage(nn.Module):
    """Cross-stage-partial block (C2f-style): split → n bottlenecks with
    dense reuse of intermediates → fuse. Keeps tensors wide for the MXU while
    halving per-bottleneck channel cost."""

    features: int
    num_blocks: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        y = ConvBNAct(2 * hidden, 1, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        quant = isinstance(y, QT)
        a, b = q_split2(y) if quant else jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for _ in range(self.num_blocks):
            b = Bottleneck(
                hidden, shortcut=self.shortcut, expansion=1.0,
                dtype=self.dtype, axis_name=self.axis_name,
            )(b, train)
            outs.append(b)
        y = qcat(outs) if quant else jnp.concatenate(outs, axis=-1)
        return ConvBNAct(self.features, 1, dtype=self.dtype, axis_name=self.axis_name)(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5×5 max-pools, concatenated."""

    features: int
    pool_size: int = 5
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        x = ConvBNAct(hidden, 1, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        p = self.pool_size
        pad = p // 2
        if isinstance(x, QT):
            # max-pool is monotone: pool the int8 codes directly, scale
            # unchanged (all four parts share the scale object, so qcat is
            # a pure concat with no rescale pass).
            pools = [x.q]
            for _ in range(3):
                pools.append(
                    nn.max_pool(
                        pools[-1], (p, p), strides=(1, 1),
                        padding=((pad, pad), (pad, pad)),
                    )
                )
            y = qcat([QT(q, x.s) for q in pools])
        else:
            pools = [x]
            for _ in range(3):
                pools.append(
                    nn.max_pool(
                        pools[-1], (p, p), strides=(1, 1), padding=((pad, pad), (pad, pad))
                    )
                )
            y = jnp.concatenate(pools, axis=-1)
        return ConvBNAct(self.features, 1, dtype=self.dtype, axis_name=self.axis_name)(y, train)


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B,H,W,C) → (B,H/r,W/r,r²·C), channel order (dy, dx, c).

    Written as r strided row-slices + contiguous (W,C)→(W/r, r·C) reshapes
    joined on the channel axis — semantically the classic
    reshape/transpose/reshape, but with no 6-D transpose for XLA to
    materialize: the transpose formulation costs three full-resolution
    layout copies (~5.3 ms at B64 704×1248 on v5e, profiler-verified);
    this lowers to strided reads + one concat pass."""
    b, h, w, c = x.shape
    parts = [x[:, dy::r].reshape(b, h // r, w // r, r * c) for dy in range(r)]
    return jnp.concatenate(parts, axis=-1)


class SpaceToDepthStem(nn.Module):
    """TPU stem: space-to-depth(r) then one 3×3 conv.

    Replaces the classic two-strided-conv stem. A 3→32 stride-2 conv at full
    resolution runs at <2 TF/s on the MXU (3 input channels against 128
    lanes, huge memory traffic); folding a 4×4 pixel block into 48 channels
    first makes the single stem conv a 432-deep contraction at 1/16 the
    positions. Measured on v5e at 704×1248×B16: 6.1ms (conv stem) → 1.5ms.
    """

    features: int
    ratio: int = 4
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, QT):
            x = QT(space_to_depth(x.q, self.ratio), x.s)
        else:
            x = space_to_depth(x.astype(self.dtype), self.ratio)
        return ConvBNAct(
            self.features, 3, dtype=self.dtype, axis_name=self.axis_name
        )(x, train)


class PlainStage(nn.Module):
    """n × (two full-width 3×3 convs + residual) — the TPU-fast stage for
    high-resolution, narrow-channel levels.

    CSP's half-width split (hidden = features//2) is a FLOP saver on GPUs but
    poison early in a TPU net: 32-channel 3×3 convs at stride-4 resolution
    measure 8 TF/s (a quarter of the MXU lanes active) and the 1×1
    mix/reduce convs are bandwidth-bound. Full-width 3×3 convs at the same
    level run at 46-96 TF/s, so spending *more* FLOPs here is faster in
    wall-clock: CSP(64)@/4 8.4ms vs PlainStage(64,1) 2.8ms at B16 704×1248.
    The first conv also absorbs channel reduction after concats (residual
    skipped when widths differ).
    """

    features: int
    num_blocks: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32
    axis_name: "str | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        for i in range(self.num_blocks):
            y = ConvBNAct(self.features, 3, **kw)(x, train)
            y = ConvBNAct(self.features, 3, **kw)(y, train)
            if isinstance(x, QT):
                if self.shortcut and x.q.shape[-1] == self.features:
                    s_add = self.variable(
                        "quant", f"s_add_{i}", lambda: jnp.ones((), jnp.float32)
                    )
                    z = (
                        x.q.astype(jnp.float32) * x.s
                        + y.q.astype(jnp.float32) * y.s
                    )
                    x = QT(quantize_to(z, s_add.value), s_add.value)
                else:
                    x = y
            elif self.shortcut and x.shape[-1] == self.features:
                x = x + y
                if not self.is_initializing():
                    self.sow(
                        "qcal", f"add{i}_absmax",
                        jnp.max(jnp.abs(x)).astype(jnp.float32),
                        **absmax_sow_kwargs(),
                    )
            else:
                x = y
        return x


def upsample2x(x):
    """Nearest-neighbor 2× upsample (pure reshape/broadcast — free for XLA).
    Data movement only, so int8 codes upsample directly (scale unchanged)."""
    if isinstance(x, QT):
        return QT(upsample2x(x.q), x.s)
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class MLP(nn.Module):
    """Simple feed-forward block (used by transformer pieces and MoE experts)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = self.activation(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)
