"""Tests for device-side box geometry ops."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_moe_tpu.ops.boxes import (
    box_area,
    cxcywh_to_xyxy,
    elementwise_ciou,
    elementwise_giou,
    elementwise_iou,
    pairwise_giou,
    pairwise_iou,
    xyxy_to_cxcywh,
)


def _rand_boxes(n, seed=0, lo=0, hi=100):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(lo, hi, (n, 2))
    wh = rng.uniform(1, 50, (n, 2))
    return jnp.asarray(np.concatenate([xy, xy + wh], -1), dtype=jnp.float32)


class TestConversions:
    def test_roundtrip(self):
        boxes = _rand_boxes(16)
        np.testing.assert_allclose(
            cxcywh_to_xyxy(xyxy_to_cxcywh(boxes)), boxes, rtol=1e-5
        )

    def test_area(self):
        assert float(box_area(jnp.array([0.0, 0.0, 4.0, 5.0]))) == 20.0
        assert float(box_area(jnp.array([4.0, 5.0, 0.0, 0.0]))) == 0.0  # degenerate


class TestIou:
    def test_known_values(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
        iou = pairwise_iou(a, b)
        np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-5)

    def test_symmetry(self):
        a, b = _rand_boxes(8, 1), _rand_boxes(12, 2)
        np.testing.assert_allclose(pairwise_iou(a, b), pairwise_iou(b, a).T, rtol=1e-5)

    def test_batched_leading_dims(self):
        a = jnp.broadcast_to(_rand_boxes(8, 1), (3, 8, 4))
        b = jnp.broadcast_to(_rand_boxes(5, 2), (3, 5, 4))
        assert pairwise_iou(a, b).shape == (3, 8, 5)

    def test_elementwise_matches_pairwise_diag(self):
        a, b = _rand_boxes(8, 3), _rand_boxes(8, 4)
        np.testing.assert_allclose(
            elementwise_iou(a, b), jnp.diagonal(pairwise_iou(a, b)), rtol=1e-5
        )


class TestGeneralizedIous:
    def test_equal_boxes(self):
        a = _rand_boxes(8, 5)
        np.testing.assert_allclose(elementwise_giou(a, a), 1.0, atol=1e-5)
        np.testing.assert_allclose(elementwise_ciou(a, a), 1.0, atol=2e-3)

    def test_giou_leq_iou_and_range(self):
        a, b = _rand_boxes(64, 6), _rand_boxes(64, 7)
        giou = elementwise_giou(a, b)
        iou = elementwise_iou(a, b)
        assert bool(jnp.all(giou <= iou + 1e-5))
        assert bool(jnp.all(giou >= -1.0 - 1e-5))

    def test_giou_disjoint_negative(self):
        a = jnp.array([0.0, 0.0, 1.0, 1.0])
        b = jnp.array([10.0, 10.0, 11.0, 11.0])
        assert float(elementwise_giou(a, b)) < 0

    def test_pairwise_giou_matches_elementwise(self):
        a, b = _rand_boxes(6, 8), _rand_boxes(4, 9)
        mat = pairwise_giou(a, b)
        for i in range(6):
            for j in range(4):
                np.testing.assert_allclose(
                    mat[i, j], elementwise_giou(a[i], b[j]), rtol=1e-4
                )

    def test_losses_differentiable(self):
        a, b = _rand_boxes(8, 10), _rand_boxes(8, 11)

        def loss_g(x):
            return jnp.mean(1.0 - elementwise_giou(x, b))

        def loss_c(x):
            return jnp.mean(1.0 - elementwise_ciou(x, b))

        for fn in (loss_g, loss_c):
            grads = jax.grad(fn)(a)
            assert grads.shape == a.shape
            assert bool(jnp.all(jnp.isfinite(grads)))
            assert float(jnp.abs(grads).sum()) > 0
