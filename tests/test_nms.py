"""Tests for the static-shape batched NMS (protocol: IoU 0.7, max_det 300)."""

import jax.numpy as jnp
import numpy as np

from multimodal_moe_tpu.ops.nms import batched_nms


def _nms_reference(boxes, scores, iou_threshold, score_threshold, max_det):
    """Plain-python greedy NMS oracle."""
    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    idx = np.argsort(-scores, kind="stable")
    idx = [i for i in idx if scores[i] > score_threshold]
    keep = []
    while idx and len(keep) < max_det:
        cur = idx.pop(0)
        keep.append(cur)
        rest = []
        for j in idx:
            lt = np.maximum(boxes[cur, :2], boxes[j, :2])
            rb = np.minimum(boxes[cur, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            area = lambda b: max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
            union = area(boxes[cur]) + area(boxes[j]) - inter
            if inter / (union + 1e-7) < iou_threshold:
                rest.append(j)
        idx = rest
    return keep


class TestBasicBehavior:
    def test_suppresses_overlap(self):
        boxes = jnp.array([[[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]], dtype=jnp.float32)
        scores = jnp.array([[0.9, 0.8, 0.7]])
        out = batched_nms(boxes, scores, iou_threshold=0.5, max_det=3)
        assert out.valid.tolist() == [[True, True, False]]
        np.testing.assert_allclose(out.boxes[0, 0], [0, 0, 10, 10])
        np.testing.assert_allclose(out.boxes[0, 1], [50, 50, 60, 60])

    def test_keeps_disjoint_in_score_order(self):
        boxes = jnp.array([[[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]]], dtype=jnp.float32)
        scores = jnp.array([[0.5, 0.9, 0.7]])
        out = batched_nms(boxes, scores, iou_threshold=0.5, max_det=3)
        np.testing.assert_allclose(out.scores[0], [0.9, 0.7, 0.5], atol=1e-6)
        assert bool(out.valid.all())

    def test_iou_exactly_at_threshold_suppressed(self):
        # IoU([0,0,10,10],[0,0,10,7]) = 0.7 exactly → suppressed at thr 0.7.
        boxes = jnp.array([[[0, 0, 10, 10], [0, 0, 10, 7]]], dtype=jnp.float32)
        scores = jnp.array([[0.9, 0.8]])
        out = batched_nms(boxes, scores, iou_threshold=0.7, max_det=2)
        assert out.valid.tolist() == [[True, False]]

    def test_score_threshold(self):
        boxes = jnp.array([[[0, 0, 10, 10], [20, 20, 30, 30]]], dtype=jnp.float32)
        scores = jnp.array([[0.9, 0.0005]])
        out = batched_nms(boxes, scores, score_threshold=0.001, max_det=2)
        assert out.valid.tolist() == [[True, False]]
        assert float(out.scores[0, 1]) == 0.0
        assert int(out.classes[0, 1]) == -1

    def test_max_det_cap(self):
        n = 20
        boxes = jnp.asarray(
            np.stack([np.array([i * 100, 0, i * 100 + 10, 10]) for i in range(n)])[None],
            dtype=jnp.float32,
        )
        scores = jnp.linspace(0.9, 0.1, n)[None]
        out = batched_nms(boxes, scores, max_det=5)
        assert out.valid.sum() == 5

    def test_class_aware_vs_agnostic(self):
        boxes = jnp.array([[[0, 0, 10, 10], [0, 0, 10, 10]]], dtype=jnp.float32)
        scores = jnp.array([[0.9, 0.8]])
        classes = jnp.array([[0, 1]], dtype=jnp.int32)
        aware = batched_nms(boxes, scores, classes, iou_threshold=0.5, max_det=2)
        agnostic = batched_nms(
            boxes, scores, classes, iou_threshold=0.5, max_det=2, class_agnostic=True
        )
        assert aware.valid.tolist() == [[True, True]]
        assert agnostic.valid.tolist() == [[True, False]]

    def test_all_below_threshold(self):
        boxes = jnp.ones((1, 4, 4), dtype=jnp.float32)
        scores = jnp.zeros((1, 4))
        out = batched_nms(boxes, scores, max_det=4)
        assert not bool(out.valid.any())


class TestAgainstOracle:
    def test_random_boxes_match_reference(self):
        rng = np.random.default_rng(42)
        for trial in range(5):
            n = 64
            xy = rng.uniform(0, 200, (n, 2))
            wh = rng.uniform(5, 80, (n, 2))
            boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
            scores = rng.uniform(0, 1, n).astype(np.float32)

            out = batched_nms(
                jnp.asarray(boxes)[None],
                jnp.asarray(scores)[None],
                iou_threshold=0.5,
                score_threshold=0.05,
                max_det=20,
            )
            got_boxes = np.asarray(out.boxes[0])[np.asarray(out.valid[0])]

            keep = _nms_reference(boxes, scores, 0.5, 0.05, 20)
            np.testing.assert_allclose(got_boxes, boxes[keep], rtol=1e-5)

    def test_batch_matches_per_image(self):
        rng = np.random.default_rng(7)
        b, n = 4, 32
        xy = rng.uniform(0, 100, (b, n, 2))
        wh = rng.uniform(5, 40, (b, n, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), dtype=jnp.float32)
        scores = jnp.asarray(rng.uniform(0, 1, (b, n)), dtype=jnp.float32)

        full = batched_nms(boxes, scores, max_det=10)
        for i in range(b):
            single = batched_nms(boxes[i : i + 1], scores[i : i + 1], max_det=10)
            np.testing.assert_allclose(full.boxes[i], single.boxes[0], rtol=1e-6)
            np.testing.assert_array_equal(full.valid[i], single.valid[0])


class TestApproxTopkMode:
    """topk_mode='approx' (TPU tiled approx_max_k preselect) — the serving
    fidelity knob; must agree with the exact path when candidates are sparse
    relative to the pool."""

    def test_matches_exact_on_sparse_scenes(self):
        rng = np.random.default_rng(7)
        n = 4000
        boxes = rng.uniform(0, 600, (2, n, 4)).astype(np.float32)
        boxes[..., 2:] = boxes[..., :2] + np.abs(boxes[..., 2:] - boxes[..., :2]) + 1
        # trained-detector-like score profile: a few confident, rest ~0
        scores = np.full((2, n), 1e-4, np.float32)
        scores[:, :50] = rng.uniform(0.3, 1.0, (2, 50))
        a = batched_nms(jnp.asarray(boxes), jnp.asarray(scores))
        b = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), topk_mode="approx")
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        np.testing.assert_allclose(
            np.asarray(a.scores), np.asarray(b.scores), atol=1e-6
        )
