"""Independent COCOeval oracle for differentially validating ops/coco_map.py.

pycocotools cannot be installed in this environment (no network; not baked
into the image), so this module reimplements the published COCOeval *bbox*
algorithm — the exact evaluator the reference consumes through RT-DETRv2
(ref: src/models/vision/rtdetr_thirdparty.py:132-155) — as a second,
structurally independent implementation:

* it mirrors cocoeval.py's program shape (per-image ``evaluateImg`` producing
  dtMatches/gtMatches/dtIgnore arrays over the full [T,R,K,A,M] accumulate
  tensor), not coco_map.py's filtered-curve shape;
* matching follows the published loop exactly: dets in descending score
  (stable sort), GTs sorted ignore-last, best-IoU match with strict
  improvement (`ious < iou: continue`), the un-ignored→ignored ``break``
  rule, `iou = min(t, 1 - 1e-10)` threshold init, dtIg inheriting gtIg,
  and the unmatched-outside-aRng ignore;
* accumulate keeps ignored dets in the cumsum arrays (contributing to
  neither TP nor FP), divides precision by ``tp+fp+spacing(1)``, applies
  the reverse precision envelope in a Python loop, and reads the 101
  recall thresholds via ``searchsorted(..., 'left')`` with the
  out-of-range → 0 convention.

Agreement between two implementations with different internal structure on
randomized adversarial cases (score ties, duplicate boxes, empty images,
area-range boundaries) is the strongest offline substitute for running
pycocotools itself.  ``scripts/gen_coco_fixtures.py`` regenerates the golden
fixtures with *real* pycocotools whenever it is importable and records which
generator produced them.
"""

from __future__ import annotations

import numpy as np

T_THRS = np.linspace(0.5, 0.95, 10)
R_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [
    ("all", [0.0, 1e5**2]),
    ("small", [0.0, 32.0**2]),
    ("medium", [32.0**2, 96.0**2]),
    ("large", [96.0**2, 1e5**2]),
]
MAX_DETS = [1, 10, 100]


def _iou_xyxy(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """bbox IoU, maskUtils.iou conventions (areas unclipped w*h)."""
    d = np.asarray(dets, np.float64).reshape(-1, 4)
    g = np.asarray(gts, np.float64).reshape(-1, 4)
    out = np.zeros((d.shape[0], g.shape[0]), np.float64)
    for i in range(d.shape[0]):
        dw = d[i, 2] - d[i, 0]
        dh = d[i, 3] - d[i, 1]
        da = dw * dh
        for j in range(g.shape[0]):
            gw = g[j, 2] - g[j, 0]
            gh = g[j, 3] - g[j, 1]
            ga = gw * gh
            iw = min(d[i, 2], g[j, 2]) - max(d[i, 0], g[j, 0])
            ih = min(d[i, 3], g[j, 3]) - max(d[i, 1], g[j, 1])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da + ga - inter
            if union > 0:
                out[i, j] = inter / union
    return out


def _evaluate_img(det_boxes, det_scores, gt_boxes, area_rng, max_det):
    """cocoeval.COCOeval.evaluateImg for one image/category (no crowds)."""
    det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
    det_scores = np.asarray(det_scores, np.float64).reshape(-1)
    gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
    G = gt_boxes.shape[0]

    gt_area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    gt_ig0 = (gt_area < area_rng[0]) | (gt_area > area_rng[1])
    gtind = np.argsort(gt_ig0.astype(np.float64), kind="mergesort")
    gt_boxes = gt_boxes[gtind]
    gt_ig = gt_ig0[gtind].astype(np.float64)

    dtind = np.argsort(-det_scores, kind="mergesort")[:max_det]
    det_boxes = det_boxes[dtind]
    det_scores = det_scores[dtind]
    D = det_boxes.shape[0]

    ious = _iou_xyxy(det_boxes, gt_boxes)

    T = len(T_THRS)
    gtm = -np.ones((T, G))
    dtm = -np.ones((T, D))
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(T_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] >= 0:  # already matched (no crowds here)
                    continue
                # Un-ignored GTs exhausted and a match found: stop.
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    det_area = (det_boxes[:, 2] - det_boxes[:, 0]) * (det_boxes[:, 3] - det_boxes[:, 1])
    out_of_rng = (det_area < area_rng[0]) | (det_area > area_rng[1])
    dt_ig = np.logical_or(
        dt_ig.astype(bool), np.logical_and(dtm == -1, np.tile(out_of_rng, (T, 1)))
    )
    return {
        "dtMatches": dtm,
        "dtScores": det_scores,
        "dtIgnore": dt_ig,
        "gtIgnore": gt_ig,
        "num_gt": int((gt_ig == 0).sum()),
    }


def evaluate(det_boxes, det_scores, gt_boxes):
    """cocoeval evaluate+accumulate+summarize (1 category, bbox).

    Returns a dict with the 12 standard COCO summary numbers.
    """
    n_img = len(gt_boxes)
    T, R = len(T_THRS), len(R_THRS)
    A, M = len(AREA_RNGS), len(MAX_DETS)
    precision = -np.ones((T, R, A, M))
    recall = -np.ones((T, A, M))

    for a, (_, area_rng) in enumerate(AREA_RNGS):
        evals = [
            _evaluate_img(det_boxes[i], det_scores[i], gt_boxes[i], area_rng, MAX_DETS[-1])
            for i in range(n_img)
        ]
        for m, max_det in enumerate(MAX_DETS):
            dt_scores = np.concatenate([e["dtScores"][:max_det] for e in evals])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"][:, :max_det] for e in evals], axis=1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"][:, :max_det] for e in evals], axis=1)[:, inds]
            npig = sum(e["num_gt"] for e in evals)
            if npig == 0:
                continue
            tps = np.logical_and(dtm >= 0, np.logical_not(dt_ig))
            fps = np.logical_and(dtm < 0, np.logical_not(dt_ig))
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for t in range(T):
                tp, fp = tp_sum[t], fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros(R)
                recall[t, a, m] = rc[-1] if nd else 0.0
                pr = pr.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds_r = np.searchsorted(rc, R_THRS, side="left")
                for ri, pi in enumerate(inds_r):
                    if pi < nd:
                        q[ri] = pr[pi]
                precision[t, :, a, m] = q

    def _s_ap(iou=None, area="all", max_det=100):
        aind = [i for i, (k, _) in enumerate(AREA_RNGS) if k == area]
        mind = [i for i, v in enumerate(MAX_DETS) if v == max_det]
        s = precision
        if iou is not None:
            s = s[np.where(np.isclose(T_THRS, iou))[0]]
        s = s[:, :, aind, mind]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    def _s_ar(area="all", max_det=100):
        aind = [i for i, (k, _) in enumerate(AREA_RNGS) if k == area]
        mind = [i for i, v in enumerate(MAX_DETS) if v == max_det]
        s = recall[:, aind, mind]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    return {
        "map50_95": _s_ap(),
        "map50": _s_ap(iou=0.5),
        "map75": _s_ap(iou=0.75),
        "ap_small": _s_ap(area="small"),
        "ap_medium": _s_ap(area="medium"),
        "ap_large": _s_ap(area="large"),
        "ar_1": _s_ar(max_det=1),
        "ar_10": _s_ar(max_det=10),
        "ar_100": _s_ar(max_det=100),
    }


def random_problem(rng: np.random.Generator, case: int):
    """One randomized eval problem stressing a specific convention.

    Returns (det_boxes, det_scores, gt_boxes): per-image lists. Cases cycle
    through the failure modes hand-made goldens don't reach: score ties,
    duplicate boxes, empty images, area-range boundary boxes, dets without
    GT (and vice versa), quantized scores with heavy tie runs.
    """
    mode = case % 7
    n_img = int(rng.integers(2, 7))
    det_boxes, det_scores, gt_boxes = [], [], []
    for i in range(n_img):
        n_gt = int(rng.integers(0, 9))
        if mode == 2 and i == 0:
            n_gt = 0  # empty-GT image with dets
        gt = np.zeros((n_gt, 4))
        for j in range(n_gt):
            if mode == 3:
                # Boxes hugging the 32²/96² area-range boundaries.
                side = float(rng.choice([31.9, 32.0, 32.01, 95.9, 96.0, 96.1]))
                w = h = side
            else:
                w = float(rng.uniform(4, 200))
                h = float(rng.uniform(4, 200))
            x = float(rng.uniform(0, 640 - w))
            y = float(rng.uniform(0, 640 - h))
            gt[j] = [x, y, x + w, y + h]
        n_dt = int(rng.integers(0, 14))
        if mode == 4 and i == 0:
            n_dt = 0  # GT-only image
        dts, scs = [], []
        for j in range(n_dt):
            if n_gt and rng.uniform() < 0.7:
                # Perturbed copy of a GT (often a duplicate in mode 1).
                base = gt[int(rng.integers(0, n_gt))].copy()
                if mode == 1 and j % 2 == 0:
                    dts.append(base)  # exact duplicate box
                else:
                    jitter = rng.normal(0, 6, 4)
                    dts.append(base + jitter)
            else:
                w = float(rng.uniform(4, 200))
                h = float(rng.uniform(4, 200))
                x = float(rng.uniform(0, 640 - w))
                y = float(rng.uniform(0, 640 - h))
                dts.append(np.array([x, y, x + w, y + h]))
            if mode in (0, 6):
                scs.append(float(rng.choice([0.9, 0.7, 0.5, 0.3])))  # tie runs
            elif mode == 5:
                scs.append(round(float(rng.uniform(0, 1)), 1))  # quantized
            else:
                scs.append(float(rng.uniform(0.01, 1.0)))
        det_boxes.append(np.asarray(dts, np.float64).reshape(-1, 4))
        det_scores.append(np.asarray(scs, np.float64))
        gt_boxes.append(gt)
    return det_boxes, det_scores, gt_boxes
