"""Hand-verified golden tests for the in-framework COCO evaluator.

Expected values computed analytically from the pycocotools conventions
(101-point interpolation, greedy score-ordered matching).
"""

import numpy as np
import pytest

from multimodal_moe_tpu.ops.coco_map import evaluate_detections, match_image


def _box(x, y, w, h):
    return np.array([x, y, x + w, y + h], dtype=np.float64)


class TestMatchImage:
    def test_perfect_match(self):
        gt = np.stack([_box(0, 0, 10, 10), _box(50, 50, 10, 10)])
        ev = match_image(gt, np.array([0.9, 0.8]), gt)
        assert ev.num_gt == 2
        assert ev.matched.all()
        assert not ev.ignored.any()

    def test_greedy_higher_score_wins(self):
        gt = _box(0, 0, 10, 10)[None]
        dets = np.stack([_box(0, 0, 10, 10), _box(0.5, 0.5, 10, 10)])
        ev = match_image(dets, np.array([0.6, 0.9]), gt)
        # Score 0.9 det is matched first (greedy), 0.6 det becomes FP.
        assert ev.matched[0].tolist() == [True, False]

    def test_each_gt_matched_once(self):
        gt = _box(0, 0, 10, 10)[None]
        dets = np.stack([_box(0, 0, 10, 10), _box(0, 0, 10, 10)])
        ev = match_image(dets, np.array([0.9, 0.8]), gt)
        assert ev.matched[0].sum() == 1

    def test_area_range_ignores(self):
        # GT of area 100 (small) + GT of area 10000 (medium/large boundary).
        gts = np.stack([_box(0, 0, 10, 10), _box(50, 50, 100, 100)])
        dets = gts.copy()
        scores = np.array([0.9, 0.8])
        ev_small = match_image(dets, scores, gts, area_range=(0.0, 32.0**2))
        assert ev_small.num_gt == 1
        # Det matched to the ignored (large) GT is ignored, not FP.
        assert ev_small.ignored[0].sum() == 1
        assert ev_small.matched[0].sum() == 1

    def test_max_det_cap(self):
        gt = _box(0, 0, 10, 10)[None]
        dets = np.stack([_box(100, 100, 5, 5), _box(0, 0, 10, 10)])
        # Cap 1 keeps only the higher-scoring det (the FP one).
        ev = match_image(dets, np.array([0.5, 0.9]), gt, max_det=1)
        assert ev.scores.shape == (1,)
        assert ev.matched[0].tolist() == [True]


class TestEvaluateDetections:
    def test_perfect_detections(self):
        gts = [np.stack([_box(0, 0, 20, 40), _box(100, 100, 30, 60)]) for _ in range(4)]
        dets = [g.copy() for g in gts]
        scores = [np.array([0.95, 0.9]) for _ in gts]
        m = evaluate_detections(dets, scores, gts)
        assert m.map50 == pytest.approx(1.0)
        assert m.map50_95 == pytest.approx(1.0)
        assert m.precision == pytest.approx(1.0)
        assert m.recall == pytest.approx(1.0)

    def test_no_detections(self):
        gts = [np.stack([_box(0, 0, 20, 40)])]
        m = evaluate_detections([np.zeros((0, 4))], [np.zeros(0)], gts)
        assert m.map50 == pytest.approx(0.0)
        assert m.recall == pytest.approx(0.0)

    def test_half_recall_ap(self):
        # 2 GTs, 1 perfect det: precision 1.0 up to recall 0.5 →
        # AP = 51/101 (recall thresholds 0.00..0.50 inclusive).
        gts = [np.stack([_box(0, 0, 20, 40), _box(100, 100, 30, 60)])]
        dets = [gts[0][:1]]
        m = evaluate_detections(dets, [np.array([0.9])], gts)
        assert m.map50 == pytest.approx(51 / 101)

    def test_fp_before_tp(self):
        # FP at score 0.9, TP at 0.8 over one GT:
        # PR points (0,0), (0.5,1.0); envelope = 0.5 everywhere → AP 0.5.
        gts = [np.stack([_box(0, 0, 20, 40)])]
        dets = [np.stack([_box(500, 500, 10, 10), _box(0, 0, 20, 40)])]
        m = evaluate_detections(dets, [np.array([0.9, 0.8])], gts)
        assert m.map50 == pytest.approx(0.5)

    def test_iou_sweep(self):
        # Det with IoU exactly 0.6 vs GT → counts at thresholds .5, .55, .6
        # (3 of 10) → map50_95 = 0.3, map50 = 1.0.
        gts = [np.stack([_box(0, 0, 10, 10)])]
        dets = [np.stack([_box(0, 0, 10, 6)])]
        m = evaluate_detections(dets, [np.array([0.9])], gts)
        assert m.map50 == pytest.approx(1.0)
        assert m.map50_95 == pytest.approx(0.3, abs=1e-6)
        assert m.ap_per_iou[:3] == pytest.approx([1.0, 1.0, 1.0])
        assert m.ap_per_iou[3] == pytest.approx(0.0)

    def test_area_breakdown(self):
        small_gt = _box(0, 0, 10, 10)         # area 100 < 32²
        large_gt = _box(50, 50, 200, 200)     # area 40000 > 96²
        gts = [np.stack([small_gt, large_gt])]
        dets = [np.stack([small_gt])]         # only the small one found
        m = evaluate_detections(dets, [np.array([0.9])], gts)
        assert m.ap_small == pytest.approx(1.0)
        assert m.ap_large == pytest.approx(0.0)
        assert m.ap_medium == -1.0  # no medium GT → NaN → -1 sentinel

    def test_ar_maxdets(self):
        # 3 disjoint GTs, 3 perfect dets → AR@1 = 1/3, AR@10 = 1.
        gts = [np.stack([_box(0, 0, 10, 10), _box(100, 0, 10, 10), _box(200, 0, 10, 10)])]
        dets = [gts[0].copy()]
        m = evaluate_detections(dets, [np.array([0.9, 0.8, 0.7])], gts)
        assert m.ar_1 == pytest.approx(1 / 3)
        assert m.ar_10 == pytest.approx(1.0)
        assert m.ar_100 == pytest.approx(1.0)

    def test_curves_shape(self):
        gts = [np.stack([_box(0, 0, 20, 40)])]
        dets = [gts[0].copy()]
        m = evaluate_detections(dets, [np.array([0.9])], gts)
        names = [c["name"] for c in m.curves]
        assert names == [
            "Precision-Recall(B)",
            "F1-Confidence(B)",
            "Precision-Confidence(B)",
            "Recall-Confidence(B)",
        ]
        for c in m.curves:
            assert len(c["x"]) == len(c["y"]) > 0
        d = m.to_metrics_dict()
        assert {"map50", "map50_95", "precision", "recall"} <= set(d)

    def test_multi_image_accumulation(self):
        # Image A: perfect det; image B: missed GT. Global recall = 0.5.
        gts = [np.stack([_box(0, 0, 20, 40)]), np.stack([_box(0, 0, 20, 40)])]
        dets = [gts[0].copy(), np.zeros((0, 4))]
        scores = [np.array([0.9]), np.zeros(0)]
        m = evaluate_detections(dets, scores, gts)
        assert m.map50 == pytest.approx(51 / 101)

    def test_score_ordering_across_images(self):
        # Global sort by score must interleave images: a high-score FP in
        # image B degrades precision for image A's lower-scored TP.
        gts = [np.stack([_box(0, 0, 20, 40)]), np.zeros((0, 4))]
        dets = [gts[0].copy(), np.stack([_box(0, 0, 20, 40)])]
        scores = [np.array([0.5]), np.array([0.9])]  # FP outranks TP
        m = evaluate_detections(dets, scores, gts)
        assert m.map50 == pytest.approx(0.5)
