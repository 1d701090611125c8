"""Pallas deformable-attention kernel: parity (fwd + all three grads)
against the XLA formulation in ops/deformable.py, including boundary and
out-of-bounds sampling locations. Runs in interpret mode on the CPU
conftest platform; the same kernel compiles on TPU (benchmarked in
docs/performance.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_moe_tpu.ops.deformable import ms_deformable_attention
from multimodal_moe_tpu.ops.deformable_pallas import ms_deformable_attention_pallas

SHAPES = ((8, 12), (4, 6), (2, 3))
B, NH, D, P = 2, 2, 8, 4
L = len(SHAPES)
TOTAL = sum(h * w for h, w in SHAPES)
Q = 7


def _problem(seed=0, loc_range=(-0.3, 1.3)):
    rng = np.random.default_rng(seed)
    values = jnp.asarray(rng.normal(0, 1, (B, TOTAL, NH, D)).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(*loc_range, (B, Q, NH, L, P, 2)).astype(np.float32)
    )
    attn = jax.nn.softmax(
        jnp.asarray(rng.normal(0, 1, (B, Q, NH, L * P)).astype(np.float32)), -1
    ).reshape(B, Q, NH, L, P)
    return values, loc, attn


@pytest.mark.parametrize("loc_range", [(0.1, 0.9), (-0.3, 1.3)])
def test_forward_parity(loc_range):
    values, loc, attn = _problem(0, loc_range)
    ref = ms_deformable_attention(values, SHAPES, loc, attn)
    out = ms_deformable_attention_pallas(values, SHAPES, loc, attn, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_exact_integer_locations():
    # samples landing exactly on pixel centers / grid lines (wx or wy == 0)
    values, _, attn = _problem(1)
    hw = np.asarray(SHAPES, np.float32)
    rng = np.random.default_rng(2)
    ij = rng.integers(0, 2, (B, Q, NH, L, P, 2)).astype(np.float32)
    # pixel center i maps back to normalized (i + 0.5) / W
    loc = jnp.asarray(
        (ij + 0.5) / hw[None, None, None, :, None, ::-1]
    )
    ref = ms_deformable_attention(values, SHAPES, loc, attn)
    out = ms_deformable_attention_pallas(values, SHAPES, loc, attn, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradient_parity():
    values, loc, attn = _problem(3)

    def loss_ref(v, l, a):
        return jnp.sum(ms_deformable_attention(v, SHAPES, l, a) ** 2)

    def loss_pal(v, l, a):
        return jnp.sum(ms_deformable_attention_pallas(v, SHAPES, l, a, True) ** 2)

    gr = jax.grad(loss_ref, (0, 1, 2))(values, loc, attn)
    gp = jax.grad(loss_pal, (0, 1, 2))(values, loc, attn)
    for name, a, b in zip(["dv", "dloc", "dattn"], gr, gp):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale, err_msg=name
        )


def test_jit_and_vmap_compatible():
    values, loc, attn = _problem(4)
    f = jax.jit(
        lambda v, l, a: ms_deformable_attention_pallas(v, SHAPES, l, a, True)
    )
    out = f(values, loc, attn)
    assert out.shape == (B, Q, NH * D)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_bf16_values_roundtrip():
    values, loc, attn = _problem(5, (0.2, 0.8))
    out = ms_deformable_attention_pallas(
        values.astype(jnp.bfloat16), SHAPES, loc, attn, True
    )
    ref = ms_deformable_attention(values, SHAPES, loc, attn)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1, rtol=0.05
    )


