"""Unit tests for canonical bbox math (behavior per ref: src/data/bboxes.py)."""

import numpy as np
import pytest

from multimodal_moe_tpu.data.bboxes import (
    clamp_xyxy,
    clamp_xyxy_batch,
    is_valid_box,
    is_valid_box_batch,
    points_to_xyxy,
    points_to_xyxy_batch,
    xyxy_to_xywh,
    xyxy_to_xywh_batch,
    xyxy_to_yolo,
    xyxy_to_yolo_batch,
)


class TestPointsToXyxy:
    def test_basic_quad(self):
        pts = [[10.0, 20.0], [50.0, 20.0], [50.0, 80.0], [10.0, 80.0]]
        assert points_to_xyxy(pts) == [10.0, 20.0, 50.0, 80.0]

    def test_unordered_points(self):
        pts = [[50.0, 80.0], [10.0, 20.0], [50.0, 20.0], [10.0, 80.0]]
        assert points_to_xyxy(pts) == [10.0, 20.0, 50.0, 80.0]

    def test_degenerate_returns_none(self):
        assert points_to_xyxy([[5.0, 5.0], [5.0, 9.0]]) is None  # zero width
        assert points_to_xyxy([[5.0, 5.0], [9.0, 5.0]]) is None  # zero height
        assert points_to_xyxy([[5.0, 5.0], [5.0, 5.0]]) is None  # single point

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            points_to_xyxy([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])


class TestConversions:
    def test_xywh_top_left(self):
        assert xyxy_to_xywh([10, 20, 50, 80]) == [10.0, 20.0, 40.0, 60.0]

    def test_yolo_normalized_center(self):
        xc, yc, w, h = xyxy_to_yolo([0, 0, 624, 352], img_w=1248, img_h=704)
        assert (xc, yc, w, h) == (0.25, 0.25, 0.5, 0.5)

    def test_yolo_default_canvas(self):
        xc, yc, w, h = xyxy_to_yolo([1248.0, 704.0, 1248.0, 704.0])
        assert xc == 1.0 and yc == 1.0

    def test_clamp_uses_pixel_index_bounds(self):
        # Max valid pixel index is W-1 / H-1 (ref: src/data/bboxes.py:151-157).
        assert clamp_xyxy([-5, -5, 2000, 2000], 1248, 704) == [0.0, 0.0, 1247.0, 703.0]

    def test_clamp_noop_inside(self):
        assert clamp_xyxy([1, 2, 3, 4], 1248, 704) == [1.0, 2.0, 3.0, 4.0]

    def test_is_valid_box(self):
        assert is_valid_box([0, 0, 2, 2])
        assert not is_valid_box([0, 0, 1.9, 5])
        assert not is_valid_box([0, 0, 5, 1.9])
        assert is_valid_box([0, 0, 1, 1], min_size=1.0)


class TestBatchApi:
    """Vectorized variants must agree with the scalar reference semantics."""

    def test_points_batch_matches_scalar(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 1000, size=(32, 4, 2)).astype(np.float32)
        boxes, valid = points_to_xyxy_batch(pts)
        for i in range(32):
            scalar = points_to_xyxy(pts[i])
            assert valid[i] == (scalar is not None)
            if scalar is not None:
                np.testing.assert_allclose(boxes[i], scalar, rtol=1e-6)

    def test_points_batch_flags_degenerate(self):
        pts = np.array([[[5, 5], [5, 9], [5, 5], [5, 9]]], dtype=np.float32)
        _, valid = points_to_xyxy_batch(pts)
        assert not valid[0]

    def test_conversion_batches_match_scalar(self):
        rng = np.random.default_rng(1)
        lo = rng.uniform(-100, 1000, size=(64, 2))
        wh = rng.uniform(1, 500, size=(64, 2))
        boxes = np.concatenate([lo, lo + wh], axis=-1).astype(np.float32)

        np.testing.assert_allclose(
            xyxy_to_xywh_batch(boxes),
            np.array([xyxy_to_xywh(b) for b in boxes]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            xyxy_to_yolo_batch(boxes),
            np.array([xyxy_to_yolo(b) for b in boxes]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            clamp_xyxy_batch(boxes),
            np.array([clamp_xyxy(b) for b in boxes]),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(
            is_valid_box_batch(boxes),
            np.array([is_valid_box(b) for b in boxes]),
        )

    def test_batch_api_works_under_jit(self):
        import jax
        import jax.numpy as jnp

        boxes = jnp.array([[10.0, 20.0, 50.0, 80.0], [-5.0, -5.0, 2000.0, 2000.0]])

        @jax.jit
        def pipeline(b):
            b = clamp_xyxy_batch(b, xp=jnp)
            return xyxy_to_yolo_batch(b, xp=jnp), is_valid_box_batch(b, xp=jnp)

        yolo, valid = pipeline(boxes)
        assert yolo.shape == (2, 4)
        assert bool(valid[0]) and bool(valid[1])
