"""Regenerate the COCO-evaluator golden fixtures (tests/fixtures/coco_map_golden.json).

Prefers *real* pycocotools when importable (run this wherever it is
installed to refresh the goldens with the authoritative evaluator — the
same one the reference consumes via RT-DETRv2,
ref: src/models/vision/rtdetr_thirdparty.py:132-155). In this build
environment pycocotools is not installable, so the committed fixtures were
produced by ``tests/cocoeval_oracle.py`` — a structurally independent
reimplementation of the published COCOeval bbox algorithm. The JSON records
which generator produced it in the ``generator`` field.

Usage: python scripts/gen_coco_fixtures.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import cocoeval_oracle  # noqa: E402

N_CASES = 56
OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "coco_map_golden.json"


def _eval_with_pycocotools(det_boxes, det_scores, gt_boxes):
    """Run real pycocotools COCOeval (bbox) on one problem."""
    import contextlib
    import io

    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    images, anns, dets = [], [], []
    ann_id = 1
    for img_id, gts in enumerate(gt_boxes, start=1):
        images.append({"id": img_id, "width": 10000, "height": 10000})
        for b in np.asarray(gts).reshape(-1, 4):
            w, h = float(b[2] - b[0]), float(b[3] - b[1])
            anns.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [float(b[0]), float(b[1]), w, h],
                    "area": w * h,
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    for img_id, (boxes, scores) in enumerate(zip(det_boxes, det_scores), start=1):
        boxes = np.asarray(boxes).reshape(-1, 4)
        for b, s in zip(boxes, np.asarray(scores).reshape(-1)):
            dets.append(
                {
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [float(b[0]), float(b[1]), float(b[2] - b[0]), float(b[3] - b[1])],
                    "score": float(s),
                }
            )
    gt_coco = COCO()
    gt_coco.dataset = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": 1, "name": "obj"}],
    }
    with contextlib.redirect_stdout(io.StringIO()):
        gt_coco.createIndex()
        if dets:
            dt_coco = gt_coco.loadRes(dets)
        else:
            dt_coco = COCO()
            dt_coco.dataset = {"images": images, "annotations": [], "categories": gt_coco.dataset["categories"]}
            dt_coco.createIndex()
        ev = COCOeval(gt_coco, dt_coco, iouType="bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
    s = ev.stats
    return {
        "map50_95": float(s[0]),
        "map50": float(s[1]),
        "map75": float(s[2]),
        "ap_small": float(s[3]),
        "ap_medium": float(s[4]),
        "ap_large": float(s[5]),
        "ar_1": float(s[6]),
        "ar_10": float(s[7]),
        "ar_100": float(s[8]),
    }


def main() -> None:
    try:
        import pycocotools  # noqa: F401

        generator = "pycocotools"
        run = _eval_with_pycocotools
    except ImportError:
        generator = "cocoeval_oracle (independent reimplementation; pycocotools unavailable offline)"
        run = cocoeval_oracle.evaluate

    cases = []
    for case in range(N_CASES):
        rng = np.random.default_rng(1000 + case)
        det_boxes, det_scores, gt_boxes = cocoeval_oracle.random_problem(rng, case)
        expected = run(det_boxes, det_scores, gt_boxes)
        cases.append(
            {
                "case": case,
                "det_boxes": [b.tolist() for b in det_boxes],
                "det_scores": [s.tolist() for s in det_scores],
                "gt_boxes": [g.tolist() for g in gt_boxes],
                "expected": expected,
            }
        )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps({"generator": generator, "cases": cases}))
    print(f"wrote {OUT} ({len(cases)} cases, generator={generator})")


if __name__ == "__main__":
    main()
