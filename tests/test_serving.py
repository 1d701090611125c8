"""Serving-path parity: decode-after-top-k and early-exit NMS must be
bit-identical to the full-decode + fixed-trip path (the eval reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_moe_tpu.models.yolo import YoloDetector
from multimodal_moe_tpu.ops.nms import batched_nms
from multimodal_moe_tpu.serving import topk_candidates, yolo_serving_nms

H, W, K = 64, 128, 32


@pytest.fixture(scope="module")
def model_out():
    model = YoloDetector(num_classes=1, variant="n")
    images = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    return model.apply(variables, images, train=False)


def _full_path(out, *, early_exit=False):
    scores = jax.nn.sigmoid(out["cls_logits"][..., 0])
    return batched_nms(
        out["boxes"], scores,
        iou_threshold=0.7, score_threshold=0.001, max_det=20,
        num_candidates=K, early_exit=early_exit,
    )


class TestTopkCandidates:
    def test_bit_identical_to_full_path(self, model_out):
        ref = _full_path(model_out)
        got = yolo_serving_nms(
            model_out, k=K, iou_threshold=0.7, score_threshold=0.001, max_det=20
        )
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
        np.testing.assert_array_equal(np.asarray(ref.boxes), np.asarray(got.boxes))
        np.testing.assert_array_equal(np.asarray(ref.scores), np.asarray(got.scores))

    def test_candidates_match_gathered_full_decode(self, model_out):
        boxes, scores = topk_candidates(model_out, k=K, score_threshold=0.001)
        full_scores = jax.nn.sigmoid(model_out["cls_logits"][..., 0])
        masked = jnp.where(full_scores > 0.001, full_scores, -1e30)
        top_scores, top_idx = jax.lax.top_k(masked, K)
        np.testing.assert_array_equal(np.asarray(scores), np.asarray(top_scores))
        expect = jnp.take_along_axis(model_out["boxes"], top_idx[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(boxes), np.asarray(expect))

    def test_threshold_masks_to_neg_inf(self, model_out):
        # A threshold above every score → all candidates masked/invalid.
        boxes, scores = topk_candidates(model_out, k=K, score_threshold=1.1)
        assert np.all(np.asarray(scores) < -1e29)
        res = yolo_serving_nms(model_out, k=K, score_threshold=1.1, max_det=20)
        assert not np.asarray(res.valid).any()

    def test_multiclass_rejected(self, model_out):
        bad = dict(model_out)
        bad["cls_logits"] = jnp.concatenate(
            [model_out["cls_logits"]] * 2, axis=-1
        )
        with pytest.raises(ValueError):
            topk_candidates(bad, k=K)


class TestEarlyExitNms:
    def test_matches_scan_path_random(self):
        rng = np.random.default_rng(7)
        n = 64
        centers = rng.uniform(10, 90, size=(2, n, 2))
        wh = rng.uniform(2, 25, size=(2, n, 2))
        boxes = jnp.asarray(
            np.concatenate([centers - wh / 2, centers + wh / 2], axis=-1),
            jnp.float32,
        )
        scores = jnp.asarray(rng.uniform(0, 1, size=(2, n)), jnp.float32)
        for thr in (0.3, 0.7):
            ref = batched_nms(
                boxes, scores, iou_threshold=thr, max_det=30, num_candidates=n
            )
            got = batched_nms(
                boxes, scores, iou_threshold=thr, max_det=30, num_candidates=n,
                early_exit=True,
            )
            for a, b in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_matches_scan_path_sparse_survivors(self):
        # Few real detections (the regime early_exit exists for): the buffer
        # tail past the last survivor must equal the scan path's padding.
        boxes = jnp.asarray(
            [[[0, 0, 10, 10], [100, 100, 110, 110], [1, 1, 11, 11]]], jnp.float32
        )
        scores = jnp.asarray([[0.9, 0.8, 0.85]], jnp.float32)
        ref = batched_nms(boxes, scores, iou_threshold=0.5, max_det=50, num_candidates=3)
        got = batched_nms(
            boxes, scores, iou_threshold=0.5, max_det=50, num_candidates=3,
            early_exit=True,
        )
        assert np.asarray(got.valid).sum() == 2
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
