"""Differential validation of ops/coco_map.py against an independent COCOeval.

VERDICT r1 missing-#3: the in-framework evaluator was only tested on
hand-made tiny cases; convention bugs (tie-breaking, ignore interactions,
interpolation edges) would pass CI and silently cost mAP parity. These tests
compare it per-metric (|Δ| < 1e-6) against

* committed golden fixtures (``tests/fixtures/coco_map_golden.json``) — the
  regen script ``scripts/gen_coco_fixtures.py`` uses *real* pycocotools when
  importable and the structurally independent oracle otherwise (recorded in
  the ``generator`` field), and
* a live sweep of fresh randomized problems against the oracle, so new seeds
  exercise the matcher beyond the committed set.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import cocoeval_oracle
from multimodal_moe_tpu.ops.coco_map import evaluate_detections

FIXTURE = Path(__file__).parent / "fixtures" / "coco_map_golden.json"
METRICS = [
    "map50_95", "map50", "map75",
    "ap_small", "ap_medium", "ap_large",
    "ar_1", "ar_10", "ar_100",
]


def _ours(det_boxes, det_scores, gt_boxes):
    m = evaluate_detections(det_boxes, det_scores, gt_boxes, compute_curves=False)
    d = m.to_metrics_dict()
    # coco_map reports -1.0 sentinels like pycocotools' summarize.
    return {k: d[k] for k in METRICS}


def _assert_close(ours: dict, expected: dict, ctx: str):
    for k in METRICS:
        a, b = ours[k], expected[k]
        if b == -1.0 or a == -1.0:
            assert a == b, f"{ctx}: {k} sentinel mismatch ours={a} expected={b}"
        else:
            assert abs(a - b) < 1e-6, f"{ctx}: {k} ours={a:.8f} expected={b:.8f}"


def test_golden_fixtures_exist_and_cover_cases():
    data = json.loads(FIXTURE.read_text())
    assert len(data["cases"]) >= 50
    assert "generator" in data


@pytest.mark.parametrize("chunk", range(8))
def test_against_golden_fixtures(chunk):
    data = json.loads(FIXTURE.read_text())
    cases = data["cases"][chunk::8]
    for c in cases:
        det_boxes = [np.asarray(b, np.float64).reshape(-1, 4) for b in c["det_boxes"]]
        det_scores = [np.asarray(s, np.float64) for s in c["det_scores"]]
        gt_boxes = [np.asarray(g, np.float64).reshape(-1, 4) for g in c["gt_boxes"]]
        _assert_close(
            _ours(det_boxes, det_scores, gt_boxes), c["expected"], f"golden case {c['case']}"
        )


@pytest.mark.parametrize("case", range(12))
def test_fresh_randomized_against_oracle(case):
    rng = np.random.default_rng(77000 + case)
    det_boxes, det_scores, gt_boxes = cocoeval_oracle.random_problem(rng, case)
    expected = cocoeval_oracle.evaluate(det_boxes, det_scores, gt_boxes)
    _assert_close(_ours(det_boxes, det_scores, gt_boxes), expected, f"fresh case {case}")


def test_all_empty_images():
    empty = [np.zeros((0, 4))] * 3
    ours = _ours(empty, [np.zeros(0)] * 3, empty)
    expected = cocoeval_oracle.evaluate(empty, [np.zeros(0)] * 3, empty)
    _assert_close(ours, expected, "all-empty")


def test_perfect_detections_ap_one():
    rng = np.random.default_rng(5)
    gts = []
    for _ in range(4):
        g = np.zeros((5, 4))
        for j in range(5):
            w, h = rng.uniform(40, 120, 2)
            x, y = rng.uniform(0, 400, 2)
            g[j] = [x, y, x + w, y + h]
        gts.append(g)
    scores = [np.linspace(0.9, 0.5, 5) for _ in gts]
    ours = _ours(gts, scores, gts)
    expected = cocoeval_oracle.evaluate(gts, scores, gts)
    _assert_close(ours, expected, "perfect")
    assert abs(ours["map50_95"] - 1.0) < 1e-6
