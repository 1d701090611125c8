"""predict_detector.py — the first-party answer to Ultralytics predict mode
(ref: src/models/vision/yolo.py:76-95): arbitrary image dir in,
predictions.json (+ annotated copies) out, boxes in source-image pixels."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """A restorable (untrained) yolo-n run dir + a dir of odd-sized JPEGs."""
    import jax  # noqa: F401  (conftest pins the cpu platform)

    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.train.detection import DetTrainConfig, DetectionTrainer
    from multimodal_moe_tpu.train.state import CheckpointManager

    root = tmp_path_factory.mktemp("predict_cli")
    run = root / "run"
    model = YoloDetector(num_classes=1, variant="n")
    trainer = DetectionTrainer(
        model,
        DetTrainConfig(variant="n", img_h=64, img_w=128, batch=2),
        steps_per_epoch=1,
    )
    CheckpointManager(run / "weights").save("best", trainer.init_state())
    (run / "model_config.json").write_text(
        json.dumps({"family": "yolo", "variant": "n", "num_classes": 1})
    )

    from PIL import Image

    imgs = root / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for name, (w, h) in [
        ("a.jpg", (320, 180)), ("b.jpg", (640, 360)), ("c.jpg", (100, 80))
    ]:
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(imgs / name)
    return run, imgs


def _run_cli(run, imgs, out_dir, *extra):
    env = dict(os.environ, MMOE_PLATFORM="cpu")
    return subprocess.run(
        [
            sys.executable, str(SCRIPTS / "predict_detector.py"),
            "--weights", str(run), "--images", str(imgs),
            "--out", str(out_dir),
            "--img-h", "64", "--img-w", "128", "--batch", "2",
            "--conf", "0.0", *extra,
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )


def test_predict_cli_end_to_end(tiny_run):
    run, imgs = tiny_run
    out = _run_cli(run, imgs, imgs / "predictions", "--draw")
    assert out.returncode == 0, out.stderr[-2000:]

    preds = json.loads((imgs / "predictions" / "predictions.json").read_text())
    assert [p["image"] for p in preds] == ["a.jpg", "b.jpg", "c.jpg"]
    # boxes come back in SOURCE-image pixel space, clamped
    for p in preds:
        assert isinstance(p["detections"], list)
        for det in p["detections"]:
            x1, y1, x2, y2 = det["xyxy"]
            assert 0 <= x1 <= p["width"] and 0 <= x2 <= p["width"]
            assert 0 <= y1 <= p["height"] and 0 <= y2 <= p["height"]
            assert 0.0 <= det["score"] <= 1.0
    # conf 0.0 on an untrained net: sigmoid scores > 0 so the pool fills
    assert sum(len(p["detections"]) for p in preds) > 0
    for name in ("pred_a.jpg", "pred_b.jpg", "pred_c.jpg"):
        assert (imgs / "predictions" / name).exists()


def test_predict_cli_int8_self_calibrates(tiny_run):
    """--int8 with no cached npz: scales calibrate on the input batches and
    the int8 serving forward produces the same artifact schema."""
    run, imgs = tiny_run
    out = _run_cli(run, imgs, imgs / "pred_i8", "--int8")
    assert out.returncode == 0, out.stderr[-2000:]
    preds = json.loads((imgs / "pred_i8" / "predictions.json").read_text())
    assert len(preds) == 3
    assert sum(len(p["detections"]) for p in preds) > 0


def test_predict_cli_conf_filters(tiny_run):
    run, imgs = tiny_run
    out = _run_cli(run, imgs, imgs / "pred_hi", "--conf", "0.999")
    assert out.returncode == 0, out.stderr[-2000:]
    preds = json.loads((imgs / "pred_hi" / "predictions.json").read_text())
    # untrained logits ~0 -> sigmoid ~0.5 < 0.999 everywhere
    assert sum(len(p["detections"]) for p in preds) == 0
