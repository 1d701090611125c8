"""Dynamic-batching serving layer (multimodal_moe_tpu/server.py): the
deployment surface the reference lacks (its only inference path is
Ultralytics .predict in-session, ref: src/models/vision/yolo.py:76-95).

Covers: single-request correctness vs the raw jitted step, coalescing
(N==batch concurrent requests -> ONE device call), padding independence
(a response never depends on batch neighbours), per-request conf, HTTP
round-trip + healthz, and the DETR-family tail selection."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

H, W, BATCH = 64, 128, 4


@pytest.fixture(scope="module")
def detector():
    import jax
    import jax.numpy as jnp  # noqa: F401  (conftest pins the cpu platform)

    from multimodal_moe_tpu.models.yolo import YoloDetector
    from multimodal_moe_tpu.server import BatchingDetector

    model = YoloDetector(num_classes=1, variant="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    det = BatchingDetector(
        model, variables, batch=BATCH, img_h=H, img_w=W,
        conf=0.0, max_wait_ms=300.0,
    )
    det.warmup()
    yield det
    det.close()


def _img(seed: int, h: int = H, w: int = W) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_single_request_matches_raw_step(detector):
    img = _img(0)
    dets = detector.predict(img)
    assert isinstance(dets, list) and len(dets) > 0  # untrained sigmoid ~0.5

    # ground truth: the raw jitted step on a zero-padded batch, row 0
    batch = np.zeros((BATCH, H, W, 3), np.uint8)
    batch[0] = img
    res = detector._step(detector.variables, batch, np.zeros((BATCH,), np.int32))
    scores = np.asarray(res.scores)[0]
    valid = np.asarray(res.valid)[0]
    boxes = np.asarray(res.boxes)[0][valid]
    assert len(dets) == int(valid.sum())
    got = np.array([d["xyxy"] for d in dets])
    np.testing.assert_allclose(got, boxes.clip(0, [W, H, W, H]), atol=0.011)
    np.testing.assert_allclose(
        [d["score"] for d in dets], scores[valid], atol=1e-4
    )


def test_coalesces_full_batch_into_one_device_call(detector):
    calls_before = detector.stats["device_calls"]
    futs = []
    barrier = threading.Barrier(BATCH)

    def go(i):
        barrier.wait()
        futs.append(detector.submit(_img(i + 10)))

    threads = [threading.Thread(target=go, args=(i,)) for i in range(BATCH)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    results = [f.result(timeout=120) for f in futs]
    assert all(isinstance(r, list) for r in results)
    # 4 requests inside one 300ms window, batch 4 -> exactly one step
    assert detector.stats["device_calls"] == calls_before + 1


def test_response_independent_of_batch_neighbours(detector):
    img = _img(99)
    solo = detector.predict(img)
    futs = [detector.submit(_img(50 + i)) for i in range(BATCH - 1)]
    futs.append(detector.submit(img))
    batched = futs[-1].result(timeout=120)
    for f in futs[:-1]:
        f.result(timeout=120)
    assert solo == batched


def test_per_request_conf_filters(detector):
    # untrained logits ~0 -> sigmoid ~0.5 < 0.999 everywhere
    assert detector.predict(_img(7), conf=0.999) == []


def test_resizes_and_rescales_to_source_pixels(detector):
    dets = detector.predict(_img(3, h=2 * H, w=3 * W))
    assert len(dets) > 0
    for d in dets:
        x1, y1, x2, y2 = d["xyxy"]
        assert 0 <= x1 <= 3 * W and 0 <= x2 <= 3 * W
        assert 0 <= y1 <= 2 * H and 0 <= y2 <= 2 * H


def test_http_roundtrip_and_healthz(detector):
    from PIL import Image

    from multimodal_moe_tpu.server import DetectorHTTPServer

    httpd = DetectorHTTPServer(("127.0.0.1", 0), detector)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        Image.fromarray(_img(42)).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?conf=0.0", data=buf.getvalue()
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        assert resp.status == 200
        assert payload["width"] == W and payload["height"] == H
        assert len(payload["detections"]) > 0
        for d in payload["detections"]:
            assert set(d) == {"xyxy", "score"}

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["ok"] is True
        assert health["batch"] == BATCH
        assert health["device_calls"] >= 1
        assert health["requests"] >= 1

        # unknown path -> 404 JSON, not a stack trace
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_raw_plane_path_matches_jpeg_free_decode(detector):
    """application/x-mmoe-raw carries pre-decoded H*W*3 uint8 RGB at model
    resolution: the server must skip decode entirely and return the same
    detections submit() gives for the identical array; a wrong-sized body
    must 400 without poisoning the connection."""
    from multimodal_moe_tpu.server import DetectorHTTPServer

    httpd = DetectorHTTPServer(("127.0.0.1", 0), detector)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = _img(7)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?conf=0.0",
            data=img.tobytes(),
            headers={"Content-Type": "application/x-mmoe-raw"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        assert resp.status == 200
        assert payload["width"] == W and payload["height"] == H
        direct = detector.predict(img, conf=0.0)
        assert len(payload["detections"]) == len(direct)
        for got, want in zip(payload["detections"], direct):
            np.testing.assert_allclose(got["xyxy"], want["xyxy"], atol=1e-3)
            assert abs(got["score"] - want["score"]) < 1e-5

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=img.tobytes()[:-7],
            headers={"Content-Type": "application/x-mmoe-raw"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_detr_family_takes_nms_free_tail():
    """make_serving_step resolves the tail from model outputs: a DETR-style
    head (no anchor_points) must route to detr_topk_select."""
    import jax.numpy as jnp

    from multimodal_moe_tpu.serving import make_serving_step

    class FakeDetr:
        def apply(self, variables, images, train=False):
            b = images.shape[0]
            q = 8
            boxes = jnp.tile(
                jnp.asarray([[0.0, 0.0, 10.0, 10.0]], jnp.float32), (q, 1)
            )[None].repeat(b, axis=0)
            logits = jnp.linspace(-2.0, 2.0, q)[None, :, None].repeat(b, axis=0)
            return {"boxes": boxes, "cls_logits": logits}

    step = make_serving_step(FakeDetr(), max_det=5)
    res = step({}, jnp.zeros((2, 16, 16, 3), jnp.uint8))
    # top-5 of 8 queries by score, all with the same box, no NMS suppression
    assert res.scores.shape == (2, 5)
    assert bool(res.valid.all())
    assert float(res.scores[0, 0]) > float(res.scores[0, -1])


def test_jpeg_dims_probe():
    """SOF header probe: correct (w, h) for baseline + progressive JPEGs,
    None for non-JPEG bytes (the handler's native-decode gate)."""
    from PIL import Image

    from multimodal_moe_tpu.server import _jpeg_dims

    arr = _img(5, h=123, w=457)
    for progressive in (False, True):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", progressive=progressive)
        assert _jpeg_dims(buf.getvalue()) == (457, 123), progressive
    png = io.BytesIO()
    Image.fromarray(arr).save(png, format="PNG")
    assert _jpeg_dims(png.getvalue()) is None
    assert _jpeg_dims(b"") is None
    assert _jpeg_dims(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no SOF

    # 0xFF fill bytes before a marker are legal (ITU T.81 B.1.1.2): the
    # marker is the LAST 0xFF of the run. A scanner that advances 2 on a
    # fill byte skips the real marker, desyncs into raw segment bytes, and
    # can return an EXIF thumbnail's SOF dims as the image's (review r4).
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    data = buf.getvalue()
    assert data[:2] == b"\xff\xd8"
    padded = data[:2] + b"\xff" * 3 + data[2:]  # fill run before 1st marker
    assert _jpeg_dims(padded) == (457, 123)


def test_submit_orig_size_maps_back(detector):
    """A pre-resized (model-space) image with an explicit orig_size must
    return detections in the ORIGINAL pixel grid — the HTTP handler's
    native-decode fast path contract."""
    dets_native = detector.predict(_img(3), orig_size=(3 * W, 2 * H))
    assert len(dets_native) > 0
    for d in dets_native:
        x1, y1, x2, y2 = d["xyxy"]
        assert 0 <= x1 <= 3 * W and 0 <= x2 <= 3 * W
        assert 0 <= y1 <= 2 * H and 0 <= y2 <= 2 * H
    # Scaling matches the full resize path up to interpolation differences:
    # the same model-space pixels, so identical boxes exactly.
    dets_model = detector.predict(_img(3))
    assert len(dets_model) == len(dets_native)
    for dm, dn in zip(dets_model, dets_native):
        assert dn["xyxy"][0] == pytest.approx(dm["xyxy"][0] * 3, abs=0.05)
        assert dn["xyxy"][1] == pytest.approx(dm["xyxy"][1] * 2, abs=0.05)
