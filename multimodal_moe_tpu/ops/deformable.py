"""Multi-scale deformable attention sampling — the hardest delegated kernel
(SURVEY.md §2b/§7: the reference gets this from RT-DETRv2's CUDA/torch
grid_sample; here it is first-party).

XLA formulation: for each query and each sampling point, bilinear
interpolation is expressed as 4 flat gathers + a weighted sum. All level
feature maps are flattened and concatenated into one ``(B, ΣHW, C)`` value
tensor so a single gather axis serves every level (static level offsets).
Gathers are the TPU's weak spot, but with heads×points kept modest
(8×4 per level, RT-DETR defaults) the op is bandwidth-bound and fuses well;
a Pallas kernel with VMEM-resident tiles is the planned upgrade
(PAPERS.md: DEFA, QUILL tiling patterns).

Everything is static-shape and fully differentiable (gathers → scatters in
the VJP, handled by XLA).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def level_shapes_to_offsets(shapes: "Sequence[Tuple[int, int]]") -> "Tuple[jnp.ndarray, int]":
    """[(H_l, W_l)] → per-level start offsets into the flattened ΣHW axis."""
    sizes = [h * w for h, w in shapes]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    return jnp.asarray(offsets, jnp.int32), sum(sizes)


def ms_deformable_attention(
    values: jnp.ndarray,            # (B, sum_HW, n_heads, head_dim)
    level_shapes: "Sequence[Tuple[int, int]]",
    sampling_locations: jnp.ndarray,  # (B, Q, n_heads, n_levels, n_points, 2) in [0,1]
    attention_weights: jnp.ndarray,   # (B, Q, n_heads, n_levels, n_points), softmaxed
) -> jnp.ndarray:
    """Multi-scale deformable attention aggregation → (B, Q, n_heads·head_dim).

    Semantics match the reference CUDA op (align_corners=False grid_sample
    with zero padding): location (x, y) in normalized [0,1] coordinates maps
    to pixel space as ``x·W - 0.5``; out-of-bounds corners contribute zero.
    """
    b, total, n_heads, head_dim = values.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    offsets, expected = level_shapes_to_offsets(level_shapes)
    assert expected == total, f"values axis {total} != Σ level sizes {expected}"

    hw = jnp.asarray(level_shapes, jnp.float32)            # (L, 2) [H, W]
    h_l = hw[:, 0][None, None, None, :, None]              # broadcast (1,1,1,L,1)
    w_l = hw[:, 1][None, None, None, :, None]

    x = sampling_locations[..., 0] * w_l - 0.5             # (B,Q,H,L,P)
    y = sampling_locations[..., 1] * h_l - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    out = jnp.zeros((b, q, n_heads, head_dim), values.dtype)
    # 4 bilinear corners: (dy, dx) ∈ {0,1}²
    for dy in (0, 1):
        for dx in (0, 1):
            cx = x0 + dx
            cy = y0 + dy
            weight = (wx if dx else (1.0 - wx)) * (wy if dy else (1.0 - wy))
            in_bounds = (cx >= 0) & (cx < w_l) & (cy >= 0) & (cy < h_l)
            cxc = jnp.clip(cx, 0, w_l - 1).astype(jnp.int32)
            cyc = jnp.clip(cy, 0, h_l - 1).astype(jnp.int32)
            flat_idx = (
                offsets[None, None, None, :, None]
                + cyc * hw[:, 1].astype(jnp.int32)[None, None, None, :, None]
                + cxc
            )                                               # (B,Q,H,L,P)
            w_eff = (weight * in_bounds * attention_weights).astype(values.dtype)

            # Gather per head: values (B, total, H, D); index over axis 1.
            # take_along_axis with flattened (Q·L·P) index per (B, H).
            idx = flat_idx.transpose(0, 2, 1, 3, 4).reshape(b, n_heads, -1)  # (B,H,QLP)
            vals = jnp.take_along_axis(
                values.transpose(0, 2, 1, 3),               # (B,H,total,D)
                idx[..., None],
                axis=2,
            )                                               # (B,H,QLP,D)
            vals = vals.reshape(b, n_heads, q, n_levels * n_points, head_dim)
            w_r = w_eff.transpose(0, 2, 1, 3, 4).reshape(
                b, n_heads, q, n_levels * n_points, 1
            )
            out = out + (vals * w_r).sum(3).transpose(0, 2, 1, 3)

    return out.reshape(b, q, n_heads * head_dim)
