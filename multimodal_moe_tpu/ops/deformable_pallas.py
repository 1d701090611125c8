"""Pallas TPU kernel for multi-scale deformable attention (SURVEY §7
hard-part #1; the reference delegates this to RT-DETRv2's CUDA op,
ref: src/models/vision/rtdetr_thirdparty.py:122-129).

Why a kernel: XLA expresses the bilinear sampling as ~768K independent row
gathers (fwd) and the VJP as row *scatters* — measured on v5e at B4/Q500:
17.4 ms fwd and 93.5 ms fwd+bwd **per decoder layer**. The scatter-add is
the RT-DETR training bottleneck (6 layers ≈ 570 ms of the 717 ms step).

Design (TPU-first, not a CUDA translation):
- Grid over batch·head; each program holds its (total_hw, head_dim) value
  slab in VMEM (~2.3 MB f32 at protocol res) — every gather and every
  backward accumulation is a VMEM-local dynamic row slice; no HBM scatter
  ever materializes.
- Bilinear structure: the two x-corners of a sample are **adjacent rows**
  in the (H·W, D) slab and the two y-corners are exactly W rows apart, so
  each sample point needs ONE int32 base index (SMEM) and two (2, D)
  dynamic-slice reads.
- The weighted 4-corner combine over all L·P points of a query is one tiny
  MXU matvec: (1, 4·L·P) @ (4·L·P, D).
- Backward: dV accumulates with sequential read-modify-write into the
  VMEM slab (programs own disjoint (b, h) slabs; the query loop is
  sequential — no write race). The per-slot sums s_c = <g, V_c> fall out
  of the same pass as one matmul, and d(locations)/d(attention) are then
  recovered *elementwise* outside the kernel — no second gather pass.

Out-of-bounds semantics match grid_sample(align_corners=False, zeros):
read rows are clamped into the slab and per-READ-SLOT weights are assigned
by coordinate matching, so a clamped slot that no in-bounds corner maps to
gets weight 0 rather than a wrong value.

NEGATIVE RESULT (round 5, measured on v5e — do not retry): a row-interleaved
slab layout (XLA pre-builds V_i[2r]=V[r], V_i[2r+1]=V[r+W] so all four
corners become ONE (4, D) slice; bwd accumulates in the same interleaved
space) LOST on every shape despite halving the dynamic-slice count: fwd
9.07 ms vs 7.2, fwd+bwd 22.69 ms vs 12.5 at B4/Q500 (artifact:
outputs/analysis/perf/perf_r5_deform_interleaved.jsonl). The 2× slab
build/VMEM traffic outweighs the issue-count saving; this layout (two
(2, D) slices per point) is the measured-fastest. Baselines: 7.2 ms fwd /
12.5 ms fwd+bwd per layer at B4/Q500 (round 2, reconfirmed round 5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# vectorized geometry precompute (XLA, outside the kernel)
# --------------------------------------------------------------------------

def _slot_weights(level_shapes, loc):
    """Per-read-slot bilinear weights and (for bwd) their wx/wy derivatives.

    Returns base (B,Q,NH,L,P) int32 and wslot (B,Q,NH,L,P,2y,2x) f32.
    """
    hw = jnp.asarray(level_shapes, jnp.float32)
    h_l = hw[:, 0][None, None, None, :, None]
    w_l = hw[:, 1][None, None, None, :, None]
    x = loc[..., 0] * w_l - 0.5
    y = loc[..., 1] * h_l - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0c = jnp.clip(x0, 0, w_l - 2)
    y0c = jnp.clip(y0, 0, h_l - 2)

    def slot_w(c0, cc, frac, j):
        pos = cc + j
        return jnp.where(pos == c0, 1.0 - frac, jnp.where(pos == c0 + 1, frac, 0.0))

    wx_s = jnp.stack([slot_w(x0, x0c, wx, 0), slot_w(x0, x0c, wx, 1)], -1)  # (...,2x)
    wy_s = jnp.stack([slot_w(y0, y0c, wy, 0), slot_w(y0, y0c, wy, 1)], -1)  # (...,2y)
    wslot = wy_s[..., :, None] * wx_s[..., None, :]  # (B,Q,NH,L,P,2y,2x)

    sizes = [h * w for h, w in level_shapes]
    offsets = jnp.asarray(
        [sum(sizes[:i]) for i in range(len(sizes))], jnp.int32
    )[None, None, None, :, None]
    wi = hw[:, 1].astype(jnp.int32)[None, None, None, :, None]
    base = offsets + y0c.astype(jnp.int32) * wi + x0c.astype(jnp.int32)
    return base, wslot, (x0, y0, x0c, y0c, wx_s, wy_s, w_l, h_l)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _fwd_kernel(level_ws, lp, d, q, idx_ref, w_ref, v_ref, out_ref, scratch):
    def body(qi, carry):
        for j in range(lp):
            b = idx_ref[0, qi, j]
            scratch[4 * j : 4 * j + 2, :] = v_ref[0, pl.ds(b, 2), :]
            scratch[4 * j + 2 : 4 * j + 4, :] = v_ref[0, pl.ds(b + level_ws[j], 2), :]
        wrow = w_ref[0, qi, :].reshape(1, 4 * lp)
        out_ref[0, qi, :] = lax.dot_general(
            wrow, scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ).reshape(d)
        return carry

    lax.fori_loop(0, q, body, 0)


def _bwd_kernel(level_ws, lp, d, q, idx_ref, w_ref, v_ref, g_ref,
                dv_ref, s_ref, scratch):
    dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    def body(qi, carry):
        for j in range(lp):
            b = idx_ref[0, qi, j]
            scratch[4 * j : 4 * j + 2, :] = v_ref[0, pl.ds(b, 2), :]
            scratch[4 * j + 2 : 4 * j + 4, :] = v_ref[0, pl.ds(b + level_ws[j], 2), :]
        grow = g_ref[0, qi, :].reshape(1, d)
        s_ref[0, qi, :] = lax.dot_general(
            grow, scratch[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ).reshape(4 * lp)
        wcol = w_ref[0, qi, :].reshape(4 * lp, 1)
        contrib = lax.dot_general(
            wcol, grow, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        for j in range(lp):
            b = idx_ref[0, qi, j]
            dv_ref[0, pl.ds(b, 2), :] = (
                dv_ref[0, pl.ds(b, 2), :] + contrib[4 * j : 4 * j + 2, :]
            )
            bw = b + level_ws[j]
            dv_ref[0, pl.ds(bw, 2), :] = (
                dv_ref[0, pl.ds(bw, 2), :] + contrib[4 * j + 2 : 4 * j + 4, :]
            )
        return carry

    lax.fori_loop(0, q, body, 0)


def _interpret_default() -> bool:
    return jax.devices()[0].platform != "tpu"


def _level_ws(level_shapes, num_points) -> "Tuple[int, ...]":
    """Static row stride between the two y-slots, per unrolled j = l·P + p."""
    return tuple(int(w) for (_, w) in level_shapes for _ in range(num_points))


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

def _prep(values, level_shapes, loc, attn):
    base, wslot, _ = _slot_weights(level_shapes, loc)
    b, q, nh, l, p = attn.shape
    lp = l * p
    w4 = wslot * attn[..., None, None]
    w4 = (
        w4.reshape(b, q, nh, lp, 4).transpose(0, 2, 1, 3, 4)
        .reshape(b * nh, q, 4 * lp).astype(jnp.float32)
    )
    idx = base.reshape(b, q, nh, lp).transpose(0, 2, 1, 3).reshape(b * nh, q, lp)
    values_t = (
        values.astype(jnp.float32).transpose(0, 2, 1, 3)
        .reshape(b * nh, values.shape[1], values.shape[3])
    )
    return values_t, idx, w4


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deformable_attention_pallas(
    values: jnp.ndarray,              # (B, total_hw, NH, D)
    level_shapes: "Tuple[Tuple[int, int], ...]",
    sampling_locations: jnp.ndarray,  # (B, Q, NH, L, P, 2) in [0,1]
    attention_weights: jnp.ndarray,   # (B, Q, NH, L, P) softmaxed
    interpret: "bool | None" = None,
) -> jnp.ndarray:
    out, _ = _fwd_rule(values, level_shapes, sampling_locations,
                       attention_weights, interpret)
    return out


def _fwd_rule(values, level_shapes, loc, attn, interpret):
    if interpret is None:
        interpret = _interpret_default()
    b, total, nh, d = values.shape
    _, q, _, l, p = attn.shape
    level_shapes = tuple(tuple(int(v) for v in s) for s in level_shapes)
    # _slot_weights clips corner indices to [0, dim-2]; a 1-px level would
    # invert the clip bounds and silently produce negative base indices.
    for h_l, w_l in level_shapes:
        if h_l < 2 or w_l < 2:
            raise ValueError(
                f"deformable kernel requires every level >= 2x2, got {level_shapes}"
            )
    lp = l * p
    values_t, idx, w4 = _prep(values, level_shapes, loc, attn)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, _level_ws(level_shapes, p), lp, d, q),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec((1, q, lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q, 4 * lp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, total, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, q, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * lp, d), jnp.float32)],
        # the (total, D=32) slab lane-pads to 128 → 4× VMEM; v5e has 128 MiB
        # physical VMEM, the default 16 MiB scoped limit is just conservative
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, w4, values_t)

    res = (values_t, idx, w4, loc, attn, jnp.zeros((), values.dtype))
    out = out.reshape(b, nh, q, d).transpose(0, 2, 1, 3).reshape(b, q, nh * d)
    return out.astype(values.dtype), res


def _bwd_rule(level_shapes, interpret, res, g):
    if interpret is None:
        interpret = _interpret_default()
    values_t, idx, w4, loc, attn, vtoken = res
    bnh, total, d = values_t.shape
    b, q, nh, l, p = attn.shape
    lp = l * p
    level_shapes = tuple(tuple(int(v) for v in s) for s in level_shapes)
    g_t = (
        g.reshape(b, q, nh, d).transpose(0, 2, 1, 3)
        .reshape(bnh, q, d).astype(jnp.float32)
    )

    dv_t, s = pl.pallas_call(
        functools.partial(_bwd_kernel, _level_ws(level_shapes, p), lp, d, q),
        grid=(bnh,),
        in_specs=[
            pl.BlockSpec((1, q, lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q, 4 * lp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, total, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, q, d), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, total, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, q, 4 * lp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnh, total, d), jnp.float32),
            jax.ShapeDtypeStruct((bnh, q, 4 * lp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((4 * lp, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, w4, values_t, g_t)

    dv = (
        dv_t.reshape(b, nh, total, d).transpose(0, 2, 1, 3).astype(vtoken.dtype)
    )

    # --- d(attention), d(loc): elementwise from the per-slot sums ---------
    _, wslot, geom = _slot_weights(level_shapes, loc)
    x0, y0, x0c, y0c, wx_s, wy_s, w_l, h_l = geom
    s = (
        s.reshape(b, nh, q, lp, 2, 2).transpose(0, 2, 1, 3, 4, 5)
        .reshape(b, q, nh, l, p, 2, 2)
    )

    d_attn = (wslot * s).sum((-1, -2)).astype(attn.dtype)

    def slot_dw(c0, cc, j):
        pos = cc + j
        return jnp.where(pos == c0, -1.0, jnp.where(pos == c0 + 1, 1.0, 0.0))

    dwx_s = jnp.stack([slot_dw(x0, x0c, 0), slot_dw(x0, x0c, 1)], -1)
    dwy_s = jnp.stack([slot_dw(y0, y0c, 0), slot_dw(y0, y0c, 1)], -1)

    a = attn[..., None, None]
    dwx = (s * a * (wy_s[..., :, None] * dwx_s[..., None, :])).sum((-1, -2))
    dwy = (s * a * (dwy_s[..., :, None] * wx_s[..., None, :])).sum((-1, -2))
    d_loc = jnp.stack([dwx * w_l, dwy * h_l], -1).astype(loc.dtype)

    return dv, d_loc, d_attn


ms_deformable_attention_pallas.defvjp(_fwd_rule, _bwd_rule)
