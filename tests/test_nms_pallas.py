"""Pallas NMS kernel vs the XLA batched NMS (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_moe_tpu.ops.nms import batched_nms
from multimodal_moe_tpu.ops.nms_pallas import batched_nms_pallas


def _random_batch(b=3, n=256, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 400, (b, n, 2))
    wh = rng.uniform(5, 120, (b, n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    return jnp.asarray(boxes), jnp.asarray(scores)


class TestPallasNms:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_xla_nms(self, seed):
        boxes, scores = _random_batch(seed=seed)
        kwargs = dict(
            iou_threshold=0.5, score_threshold=0.05, max_det=50, num_candidates=256
        )
        ours = batched_nms_pallas(boxes, scores, interpret=True, **kwargs)
        ref = batched_nms(boxes, scores, **kwargs)
        np.testing.assert_array_equal(np.asarray(ours.valid), np.asarray(ref.valid))
        np.testing.assert_allclose(
            np.asarray(ours.scores), np.asarray(ref.scores), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ours.boxes), np.asarray(ref.boxes), rtol=1e-6
        )

    def test_protocol_settings(self):
        boxes, scores = _random_batch(b=2, n=512, seed=3)
        ours = batched_nms_pallas(
            boxes, scores, iou_threshold=0.7, max_det=300, interpret=True
        )
        ref = batched_nms(
            boxes, scores, iou_threshold=0.7, max_det=300, num_candidates=512
        )
        np.testing.assert_array_equal(np.asarray(ours.valid), np.asarray(ref.valid))
        np.testing.assert_allclose(
            np.asarray(ours.boxes), np.asarray(ref.boxes), rtol=1e-6
        )

    def test_all_invalid(self):
        boxes = jnp.ones((1, 128, 4))
        scores = jnp.zeros((1, 128))
        out = batched_nms_pallas(boxes, scores, max_det=10, interpret=True)
        assert not bool(np.asarray(out.valid).any())
