"""ctypes bindings for the native JPEG loader (native/jpeg_loader).

Auto-builds the shared library on first use when a toolchain is present and
falls back to PIL transparently otherwise, so the framework never hard-fails
on a machine without g++/libjpeg.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "lib" / "libmmoe_jpeg.so"
_SRC_PATH = _NATIVE_DIR / "jpeg_loader" / "jpeg_loader.cpp"
# Must match mmoe_jpeg_version() in jpeg_loader.cpp; a mismatch (stale .so on
# disk) triggers a rebuild so binaries can never silently lag the source.
_EXPECTED_VERSION = 12

_lib: "Optional[ctypes.CDLL]" = None
_load_attempted = False


def _try_build() -> bool:
    build = _NATIVE_DIR / "build.sh"
    if not build.exists():
        return False
    try:
        subprocess.run(
            ["sh", str(build)], check=True, capture_output=True, timeout=300
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError):
        return False


def _is_stale() -> bool:
    """True when the on-disk .so predates the source or reports an old
    version — the library is never loaded stale."""
    try:
        if _SRC_PATH.exists() and _SRC_PATH.stat().st_mtime > _LIB_PATH.stat().st_mtime:
            return True
        probe = ctypes.CDLL(str(_LIB_PATH))
        probe.mmoe_jpeg_version.restype = ctypes.c_int
        return int(probe.mmoe_jpeg_version()) != _EXPECTED_VERSION
    except (OSError, AttributeError):
        return True


def load_library() -> "Optional[ctypes.CDLL]":
    """Load (building if needed) the native decoder; None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() or _is_stale():
        if not _try_build() or _is_stale():
            return None  # unbuildable or still stale: PIL fallback
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.mmoe_decode_jpeg.restype = ctypes.c_int
    lib.mmoe_decode_jpeg.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mmoe_decode_files.restype = ctypes.c_int
    lib.mmoe_decode_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mmoe_decode_jpeg_yuv420.restype = ctypes.c_int
    lib.mmoe_decode_jpeg_yuv420.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
    ]
    lib.mmoe_decode_files_yuv420.restype = ctypes.c_int
    lib.mmoe_decode_files_yuv420.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_library() is not None


def decode_jpeg_bytes(data: bytes, out_h: int, out_w: int) -> np.ndarray:
    """Decode one JPEG byte string to (out_h, out_w, 3) uint8."""
    lib = load_library()
    if lib is None:
        return _pil_decode_bytes(data, out_h, out_w)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.mmoe_decode_jpeg(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h,
        out_w,
    )
    if rc != 0:
        raise ValueError(f"native JPEG decode failed (rc={rc})")
    return out


def decode_jpeg_files(
    paths: "Sequence[str | os.PathLike]",
    out_h: int,
    out_w: int,
    *,
    n_threads: Optional[int] = None,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode a batch of JPEG files to one (N, out_h, out_w, 3) uint8 array
    on the native thread pool (no GIL)."""
    n = len(paths)
    lib = load_library()
    if out is None:
        out = np.empty((n, out_h, out_w, 3), np.uint8)
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = _pil_decode_bytes(Path(p).read_bytes(), out_h, out_w)
        return out
    if n_threads is None:
        n_threads = max(1, (os.cpu_count() or 1))
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    status = (ctypes.c_int * n)()
    failures = lib.mmoe_decode_files(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h,
        out_w,
        n_threads,
        status,
    )
    if failures:
        bad = [str(paths[i]) for i in range(n) if status[i] != 0]
        raise ValueError(f"native JPEG decode failed for {len(bad)} files: {bad[:3]}")
    return out


def decode_jpeg_bytes_yuv420(data: bytes, h: int, w: int):
    """One 4:2:0 JPEG → (y (h,w), cb (h/2,w/2), cr (h/2,w/2)) uint8 planes.

    Returns None when the stream is not 3-component 2×2-subsampled at the
    exact size (caller falls back to the RGB path)."""
    lib = load_library()
    if lib is None:
        return None
    y = np.empty((h, w), np.uint8)
    cb = np.empty((h // 2, w // 2), np.uint8)
    cr = np.empty((h // 2, w // 2), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.mmoe_decode_jpeg_yuv420(
        data, len(data),
        y.ctypes.data_as(u8p), cb.ctypes.data_as(u8p), cr.ctypes.data_as(u8p),
        h, w,
    )
    if rc == 3:
        return None
    if rc != 0:
        raise ValueError(f"native YUV420 decode failed (rc={rc})")
    return y, cb, cr


def decode_jpeg_files_yuv420(
    paths: "Sequence[str | os.PathLike]",
    h: int,
    w: int,
    *,
    n_threads: Optional[int] = None,
):
    """Batch of 4:2:0 JPEGs → (y (N,h,w), cb (N,h/2,w/2), cr (N,h/2,w/2)).

    Raises ValueError on any unsuitable/undecodable file."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    y = np.empty((n, h, w), np.uint8)
    cb = np.empty((n, h // 2, w // 2), np.uint8)
    cr = np.empty((n, h // 2, w // 2), np.uint8)
    if n_threads is None:
        n_threads = max(1, (os.cpu_count() or 1))
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    status = (ctypes.c_int * n)()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    failures = lib.mmoe_decode_files_yuv420(
        c_paths, n,
        y.ctypes.data_as(u8p), cb.ctypes.data_as(u8p), cr.ctypes.data_as(u8p),
        h, w, n_threads, status,
    )
    if failures:
        bad = [str(paths[i]) for i in range(n) if status[i] != 0]
        raise ValueError(f"native YUV420 decode failed for {len(bad)} files: {bad[:3]}")
    return y, cb, cr


def _pil_decode_bytes(data: bytes, out_h: int, out_w: int) -> np.ndarray:
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        img = img.convert("RGB")
        if img.size != (out_w, out_h):
            img = img.resize((out_w, out_h), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)
