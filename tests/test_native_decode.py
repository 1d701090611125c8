"""Tests for the native C++ JPEG loader + device-side YUV→RGB preprocessing."""

import io

import numpy as np
import pytest

from multimodal_moe_tpu.data.native_decode import (
    decode_jpeg_bytes,
    decode_jpeg_bytes_yuv420,
    decode_jpeg_files,
    decode_jpeg_files_yuv420,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder not built"
)

H, W = 64, 128


def _make_jpeg(tmp_path, name="a.jpg", size=(W, H), subsampling=2, quality=92):
    from PIL import Image

    rng = np.random.default_rng(0)
    # smooth image (JPEG-friendly)
    yy = np.linspace(0, 200, size[1])[:, None]
    xx = np.linspace(0, 55, size[0])[None, :]
    arr = np.clip(yy + xx + rng.normal(0, 2, (size[1], size[0])), 0, 255)
    img = np.stack([arr, arr * 0.8 + 20, 255 - arr], -1).astype(np.uint8)
    p = tmp_path / name
    Image.fromarray(img).save(p, quality=quality, subsampling=subsampling)
    return p


class TestRgbDecode:
    def test_matches_pil(self, tmp_path):
        from PIL import Image

        p = _make_jpeg(tmp_path)
        got = decode_jpeg_bytes(p.read_bytes(), H, W)
        want = np.asarray(Image.open(p).convert("RGB"))
        assert got.shape == (H, W, 3)
        np.testing.assert_array_equal(got, want)

    def test_batch_files(self, tmp_path):
        paths = [_make_jpeg(tmp_path, f"f{i}.jpg") for i in range(5)]
        out = decode_jpeg_files(paths, H, W, n_threads=2)
        assert out.shape == (5, H, W, 3)
        single = decode_jpeg_bytes(paths[3].read_bytes(), H, W)
        np.testing.assert_array_equal(out[3], single)

    def test_resize_path(self, tmp_path):
        p = _make_jpeg(tmp_path, size=(W * 2, H * 2))
        out = decode_jpeg_bytes(p.read_bytes(), H, W)
        assert out.shape == (H, W, 3)

    def test_corrupt_raises(self, tmp_path):
        with pytest.raises(ValueError):
            decode_jpeg_bytes(b"not a jpeg at all" * 10, H, W)


class TestYuv420Decode:
    def test_planes_and_device_conversion(self, tmp_path):
        import jax

        from multimodal_moe_tpu.ops.preprocess import yuv420_to_rgb

        p = _make_jpeg(tmp_path, subsampling=2)
        out = decode_jpeg_bytes_yuv420(p.read_bytes(), H, W)
        assert out is not None
        y, cb, cr = out
        assert y.shape == (H, W) and cb.shape == (H // 2, W // 2)

        rgb = np.asarray(
            jax.jit(yuv420_to_rgb)(y[None], cb[None], cr[None])
        )[0]
        ref = decode_jpeg_bytes(p.read_bytes(), H, W).astype(np.float32)
        diff = np.abs(rgb - ref)
        # nearest-neighbor chroma vs libjpeg fancy upsampling: small on
        # natural images
        assert diff.mean() < 2.0
        assert np.quantile(diff, 0.99) < 16.0

    def test_non_mcu_aligned_height_last_rows(self, tmp_path):
        # Regression (round-1 advisor): heights not a multiple of 16 used to
        # alias MCU-padding rows onto the last real luma/chroma rows. The
        # last rows must match PIL's luma exactly.
        from PIL import Image

        h, w = 56, 128  # 56 % 16 == 8 → padding rows exist in the last MCU
        p = _make_jpeg(tmp_path, "odd.jpg", size=(w, h))
        out = decode_jpeg_bytes_yuv420(p.read_bytes(), h, w)
        assert out is not None
        y, cb, cr = out
        # PIL draft mode decodes JPEG natively as YCbCr: its luma plane is
        # bit-exact libjpeg output (convert("YCbCr") without draft would
        # round-trip through RGB and differ everywhere).
        img = Image.open(p)
        img.draft("YCbCr", img.size)
        ycc = np.asarray(img.convert("YCbCr"))
        np.testing.assert_array_equal(y, ycc[..., 0])

    def test_non_420_returns_none(self, tmp_path):
        p = _make_jpeg(tmp_path, "s444.jpg", subsampling=0)  # 4:4:4
        assert decode_jpeg_bytes_yuv420(p.read_bytes(), H, W) is None

    def test_batch(self, tmp_path):
        paths = [_make_jpeg(tmp_path, f"y{i}.jpg") for i in range(4)]
        y, cb, cr = decode_jpeg_files_yuv420(paths, H, W, n_threads=2)
        assert y.shape == (4, H, W)
        single = decode_jpeg_bytes_yuv420(paths[2].read_bytes(), H, W)
        np.testing.assert_array_equal(y[2], single[0])
        np.testing.assert_array_equal(cb[2], single[1])


class TestPreprocessOps:
    def test_gray_roundtrip(self):
        from multimodal_moe_tpu.ops.preprocess import yuv420_to_rgb

        # Y=128, Cb=Cr=128 → RGB 128 gray exactly.
        y = np.full((1, 8, 16), 128, np.uint8)
        c = np.full((1, 4, 8), 128, np.uint8)
        rgb = np.asarray(yuv420_to_rgb(y, c, c))
        np.testing.assert_allclose(rgb, 128.0, atol=1e-4)

    def test_primary_colors(self):
        from multimodal_moe_tpu.ops.preprocess import yuv420_to_rgb

        # Pure red in BT.601: Y=76.245, Cb=84.972, Cr=255 (approximately).
        y = np.full((1, 2, 2), 76, np.uint8)
        cb = np.full((1, 1, 1), 85, np.uint8)
        cr = np.full((1, 1, 1), 255, np.uint8)
        rgb = np.asarray(yuv420_to_rgb(y, cb, cr))[0, 0, 0]
        assert rgb[0] > 240 and rgb[1] < 25 and rgb[2] < 25
