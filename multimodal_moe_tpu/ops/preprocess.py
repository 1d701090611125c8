"""Device-side image preprocessing: the TPU half of the split JPEG pipeline.

The host decodes JPEG entropy data to raw YCbCr 4:2:0 planes (native
jpeg_loader, no chroma upsample / color conversion); this module finishes the
job on device as pure jnp — chroma upsample, YCbCr→RGB (BT.601 full-range,
the JFIF convention), normalization. XLA fuses the whole thing into the
model's first convolution.

Why split there: the planes are HALF the bytes of RGB over the host→device
link (the measured bottleneck on the TPU tunnel), the host saves ~40% decode
CPU, and the arithmetic that remains is exactly what the VPU is good at.
Replaces the all-host PIL decode of the reference
(ref: src/data/zodmoe_frames.py:144-169).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w) → (B, 2h, 2w) nearest-neighbor (reshape/broadcast only)."""
    b, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None], (b, h, 2, w, 2))
    return x.reshape(b, h * 2, w * 2)


def yuv420_to_rgb(
    y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray, *, dtype=jnp.float32
) -> jnp.ndarray:
    """Raw 4:2:0 planes (uint8) → (B, H, W, 3) RGB in [0, 255] float.

    BT.601 full-range as used by JFIF/libjpeg:
        R = Y + 1.402 (Cr−128)
        G = Y − 0.344136 (Cb−128) − 0.714136 (Cr−128)
        B = Y + 1.772 (Cb−128)
    Chroma is upsampled nearest-neighbor (vs libjpeg's triangle filter: ≤2
    LSB difference on natural images — invisible to detection training).
    """
    yf = y.astype(dtype)
    cbf = upsample2x_nearest(cb.astype(dtype)) - 128.0
    crf = upsample2x_nearest(cr.astype(dtype)) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def yuv420_to_model_input(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """Planes → normalized (B, H, W, 3) float32 in [0, 1] (model input)."""
    return yuv420_to_rgb(y, cb, cr) / 255.0


def yuv420_to_rgb_u8(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    """Planes → (B, H, W, 3) uint8 RGB — the canonical quantization used by
    both the resident loader's in-graph gather and the streaming YUV path, so
    the two loaders produce identical pixels for the same JPEG."""
    return jnp.clip(jnp.round(yuv420_to_rgb(y, cb, cr)), 0, 255).astype(jnp.uint8)


def normalize_images_u8(images_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 → float32 in [0, 1] (RGB path)."""
    return images_u8.astype(jnp.float32) / 255.0


def imagenet_normalize(images_01: jnp.ndarray) -> jnp.ndarray:
    """Standard ImageNet mean/std (classification baseline,
    ref: scripts/train_vision_baseline.py:84-88)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], images_01.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], images_01.dtype)
    return (images_01 - mean) / std
