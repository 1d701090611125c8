"""In-graph exact LSA (Jonker-Volgenant) vs scipy's Hungarian oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from multimodal_moe_tpu.ops.assignment import batched_lsa_assign, lsa_assign


def _total_cost(cost, rows):
    return float(sum(cost[r, j] for j, r in enumerate(rows)))


class TestLsaAssign:
    @pytest.mark.parametrize("seed", range(8))
    def test_exactly_matches_scipy_cost(self, seed):
        rng = np.random.default_rng(seed)
        q = int(rng.integers(6, 48))
        m = int(rng.integers(2, min(q, 14)))
        cost = rng.normal(0, 3, (q, m)).astype(np.float32)
        got = np.asarray(lsa_assign(jnp.asarray(cost)))
        r, c = linear_sum_assignment(cost)
        want = r[np.argsort(c)]
        assert len(set(got.tolist())) == m  # distinct rows
        np.testing.assert_allclose(
            _total_cost(cost, got), _total_cost(cost, want), atol=1e-4
        )

    def test_obvious_diagonal(self):
        cost = np.full((5, 3), 10.0, np.float32)
        for j in range(3):
            cost[j, j] = 0.0
        got = np.asarray(lsa_assign(jnp.asarray(cost)))
        np.testing.assert_array_equal(got, [0, 1, 2])

    def test_big_cost_padding_goes_to_leftovers(self):
        cost = np.full((4, 2), 1e6, np.float32)
        cost[2, 0] = 0.0
        got = np.asarray(lsa_assign(jnp.asarray(cost)))
        assert got[0] == 2
        assert got[1] != 2

    def test_batched_under_jit(self):
        rng = np.random.default_rng(9)
        cost = rng.normal(0, 1, (3, 20, 6)).astype(np.float32)
        got = np.asarray(batched_lsa_assign(jnp.asarray(cost)))
        for b in range(3):
            r, c = linear_sum_assignment(cost[b])
            want = r[np.argsort(c)]
            np.testing.assert_allclose(
                _total_cost(cost[b], got[b]), _total_cost(cost[b], want), atol=1e-4
            )

    def test_detr_scale(self):
        # Protocol scale: 300 queries × 96 padded GT slots.
        rng = np.random.default_rng(11)
        cost = rng.normal(0, 2, (300, 96)).astype(np.float32)
        got = np.asarray(lsa_assign(jnp.asarray(cost)))
        r, c = linear_sum_assignment(cost)
        want = r[np.argsort(c)]
        np.testing.assert_allclose(
            _total_cost(cost, got), _total_cost(cost, want), atol=1e-3
        )

    def test_hungarian_match_uses_it(self):
        from multimodal_moe_tpu.losses.hungarian import hungarian_match

        pred_boxes = jnp.array(
            [[[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.1, 0.1], [0.5, 0.5, 0.5, 0.5]]]
        )
        pred_logits = jnp.full((1, 3, 1), 3.0)
        gt_boxes = jnp.array([[[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.1, 0.1]]])
        out = jax.jit(hungarian_match)(
            pred_logits, pred_boxes,
            jnp.zeros((1, 2), jnp.int32), gt_boxes, jnp.ones((1, 2), bool),
        )
        assert out[0].tolist() == [0, 1]
