"""Synthetic ZOD-shaped corpus generator (learnable, annotation-consistent).

The build environment has no real ZOD frames (BASELINE.md), so accuracy
work needs a stand-in corpus whose *pixels actually contain* the annotated
pedestrians: natural-ish road-scene backgrounds with pedestrian-shaped
figures rendered at the annotated locations. Used by the QA notebooks, the
mAP parity runs (VERDICT r1 missing-#2/#5), and scale tests.

The on-disk tree matches the raw ZOD layout the indexer walks
(ref: scripts/build_ZOD_index.py — frame dirs with metadata.json,
annotations/object_detection.json, camera_front_dnat/*.jpg), so the whole
ETL chain (index → bboxes → solar bins → splits → exports) runs unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

ORIG_W, ORIG_H = 3848, 2168  # ZOD camera_front_dnat dims the indexer assumes


def _render_scene(
    rng: np.random.Generator,
    boxes_xyxy: Sequence[Sequence[float]],
    *,
    w: int,
    h: int,
    night: bool,
) -> np.ndarray:
    """Road-scene-ish background + pedestrian figures at the given boxes.

    Figures are deliberately simple (head disc + body wedge + leg split in a
    distinct color family) — enough signal that a detector can learn
    localization, cheap enough to render thousands of frames on 1 core.
    """
    yy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    sky = np.array([140, 165, 200], np.float32) * (0.25 if night else 1.0)
    road = np.array([90, 88, 92], np.float32) * (0.35 if night else 1.0)
    horizon = 0.45 + float(rng.uniform(-0.05, 0.05))
    t = np.clip((yy - horizon) / 0.08, 0.0, 1.0)
    img = (sky * (1 - t) + road * t)[:, :, None].transpose(0, 2, 1)  # (h,1,3)->broadcast
    img = np.broadcast_to(img.transpose(0, 1, 2), (h, w, 3)).copy()

    # Background clutter: buildings/cars as rectangles, lane lines.
    for _ in range(int(rng.integers(6, 14))):
        cw = int(rng.integers(40, 400))
        ch = int(rng.integers(30, 260))
        x0 = int(rng.integers(0, max(1, w - cw)))
        y0 = int(rng.integers(0, max(1, h - ch)))
        col = rng.uniform(30, 160, 3).astype(np.float32) * (0.4 if night else 1.0)
        img[y0 : y0 + ch, x0 : x0 + cw] = 0.6 * img[y0 : y0 + ch, x0 : x0 + cw] + 0.4 * col

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for b in boxes_xyxy:
        x1, y1, x2, y2 = (float(v) for v in b)
        bw, bh = x2 - x1, y2 - y1
        if bw <= 2 or bh <= 4:
            continue
        cx = (x1 + x2) / 2
        base = rng.uniform(0, 1)
        # High-contrast clothing colors (pedestrians pop from the grey scene).
        body_col = np.array(
            [[210, 60, 50], [60, 90, 200], [220, 180, 40], [40, 170, 90]][int(base * 4) % 4],
            np.float32,
        ) * (0.55 if night else 1.0)
        skin = np.array([205, 170, 140], np.float32) * (0.5 if night else 1.0)
        head_r = bh * 0.14
        head_cy = y1 + head_r
        head = (xs - cx) ** 2 + (ys - head_cy) ** 2 <= head_r**2
        torso = (
            (np.abs(xs - cx) <= bw * 0.38)
            & (ys >= y1 + 2 * head_r)
            & (ys <= y1 + bh * 0.62)
        )
        leg_w = bw * 0.16
        legs = (
            ((np.abs(xs - (cx - bw * 0.18)) <= leg_w) | (np.abs(xs - (cx + bw * 0.18)) <= leg_w))
            & (ys > y1 + bh * 0.62)
            & (ys <= y2)
        )
        img[head] = skin
        img[torso] = body_col
        img[legs] = body_col * 0.7
    img += rng.normal(0, 3.0, img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_synthetic_zod_tree(
    root: "Path | str",
    n_frames: int,
    *,
    seed: int = 0,
    img_wh: "tuple[int, int]" = (ORIG_W, ORIG_H),
    render_scale: int = 4,
    night_fraction: float = 0.25,
    max_peds: int = 8,
    progress: bool = False,
) -> Path:
    """Write an indexable raw ZOD tree with rendered, learnable pedestrians.

    ``render_scale``: scenes are rendered at ``img_wh/render_scale`` and the
    true dims recorded in metadata — the indexer resizes to its target size
    anyway, and rendering at 962×542 instead of 3848×2168 is ~16× cheaper
    (the annotation coordinates are in the full-res frame, as in real ZOD).
    """
    from PIL import Image

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    w_full, h_full = img_wh
    rw, rh = w_full // render_scale, h_full // render_scale

    for i in range(n_frames):
        fid = f"{i:06d}"
        fd = root / fid
        if (fd / "metadata.json").exists():
            continue
        (fd / "camera_front_dnat").mkdir(parents=True, exist_ok=True)
        (fd / "annotations").mkdir(exist_ok=True)

        night = bool(rng.uniform() < night_fraction)
        n_ped = int(rng.integers(0, max_peds + 1))
        boxes_full = []
        for _ in range(n_ped):
            bh = float(rng.uniform(120, 700))           # full-res px
            bw = bh * float(rng.uniform(0.28, 0.45))
            x1 = float(rng.uniform(0, w_full - bw))
            y1 = float(rng.uniform(h_full * 0.35, h_full - bh))
            boxes_full.append([x1, y1, x1 + bw, y1 + bh])

        img = _render_scene(
            rng,
            [[v / render_scale for v in b] for b in boxes_full],
            w=rw,
            h=rh,
            night=night,
        )
        Image.fromarray(img).save(
            fd / "camera_front_dnat" / f"{fid}_camera_front_dnat.jpg", quality=92
        )

        tod = "night" if night else "day"
        solar = float(rng.uniform(-25, -5)) if night else float(rng.uniform(5, 55))
        (fd / "metadata.json").write_text(
            json.dumps(
                {
                    "frame_id": fid,
                    "time": "2022-06-01T12:00:00",
                    "scraped_weather": str(rng.choice(["clear", "cloudy", "rain"])),
                    "time_of_day": tod,
                    "solar_angle_elevation": solar,
                    "country_code": "SE",
                    "road_type": str(rng.choice(["city", "highway", "rural"])),
                    "road_condition": "dry",
                }
            )
        )
        objs = []
        for k, b in enumerate(boxes_full):
            x1, y1, x2, y2 = b
            unclear = bool(rng.uniform() < 0.12)
            objs.append(
                {
                    "properties": {
                        "class": "Pedestrian",
                        "unclear": unclear,
                        "occlusion_ratio": str(
                            rng.choice(["None", "Light", "Medium", "Heavy", "VeryHeavy"])
                        )
                        if not unclear
                        else None,
                        "annotation_uuid": f"{fid}-ped-{k}",
                    },
                    "geometry": {
                        "coordinates": [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]
                    },
                }
            )
        (fd / "annotations" / "object_detection.json").write_text(json.dumps(objs))
        if progress and (i + 1) % 500 == 0:
            print(f"  synthetic frames: {i + 1}/{n_frames}")
    return root
