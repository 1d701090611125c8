"""Pallas fused expert-FFN kernel vs the XLA einsum reference (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_moe_tpu.ops.moe_kernels import (
    TILE,
    _ffn_xla,
    fused_expert_ffn,
    round_up_capacity,
)

E, C, D, H = 4, TILE * 2, 64, 128


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    buf = jnp.asarray(rng.normal(size=(E * C, D)), dtype)
    w1 = jnp.asarray(rng.normal(size=(E, D, H)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(E, 1, H)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(E, H, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(E, 1, D)) * 0.05, jnp.float32)
    return buf, w1, b1, w2, b2


class TestFusedExpertFFN:
    def test_matches_xla(self):
        buf, w1, b1, w2, b2 = _inputs()
        got = fused_expert_ffn(buf, w1, b1, w2, b2, C, True)
        want = _ffn_xla(buf, w1, b1, w2, b2, capacity=C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_expert_weight_selection(self):
        # Zero all experts but #2; only rows [2C, 3C) may be nonzero beyond bias.
        buf, w1, b1, w2, b2 = _inputs(1)
        w1 = w1.at[jnp.array([0, 1, 3])].set(0.0)
        b1 = jnp.zeros_like(b1)
        b2 = jnp.zeros_like(b2)
        out = np.asarray(fused_expert_ffn(buf, w1, b1, w2, b2, C, True))
        assert np.abs(out[2 * C : 3 * C]).sum() > 0
        assert np.abs(out[: 2 * C]).max() == 0
        assert np.abs(out[3 * C :]).max() == 0

    def test_gradients_match_xla(self):
        buf, w1, b1, w2, b2 = _inputs(2)

        def loss_pallas(*args):
            return (fused_expert_ffn(*args, C, True) ** 2).mean()

        def loss_xla(*args):
            return (_ffn_xla(*args, capacity=C) ** 2).mean()

        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(buf, w1, b1, w2, b2)
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(buf, w1, b1, w2, b2)
        for a, b in zip(g_p, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_round_up_capacity(self):
        assert round_up_capacity(1) == TILE
        assert round_up_capacity(TILE) == TILE
        assert round_up_capacity(TILE + 1) == 2 * TILE
