"""Device-side training augmentation, jit-compatible.

The locked protocol zeroes *geometric* augmentation (scale/translate/mosaic,
ref: notes/experiment_protocol_camera.md:33-37, train CLI defaults at
src/models/vision/yolo.py:33-37) but the Ultralytics trainer the reference
delegates to still applies photometric HSV jitter (h 0.015, s 0.7, v 0.4)
and horizontal flip p=0.5. These run here as pure jnp on the device —
vectorized over the batch, fused into the train step by XLA, driven by the
step rng (no host-side augmentation cost on the 1-core input path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) in [0,1] → HSV in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rng = maxc - minc
    s = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) HSV in [0,1] → RGB in [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(
    images: jnp.ndarray,  # (B, H, W, 3) in [0,1]
    rng: jax.Array,
    *,
    h_gain: float = 0.015,
    s_gain: float = 0.7,
    v_gain: float = 0.4,
) -> jnp.ndarray:
    """Per-image random HSV gains (Ultralytics convention: uniform in
    ±gain around 1 for s/v, additive wraparound for hue)."""
    b = images.shape[0]
    kh, ks, kv = jax.random.split(rng, 3)
    dh = jax.random.uniform(kh, (b, 1, 1), minval=-h_gain, maxval=h_gain)
    gs = 1.0 + jax.random.uniform(ks, (b, 1, 1), minval=-s_gain, maxval=s_gain)
    gv = 1.0 + jax.random.uniform(kv, (b, 1, 1), minval=-v_gain, maxval=v_gain)
    hsv = rgb_to_hsv(images)
    h = (hsv[..., 0] + dh) % 1.0
    s = jnp.clip(hsv[..., 1] * gs, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * gv, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def random_hflip(
    images: jnp.ndarray,   # (B, H, W, 3)
    boxes: jnp.ndarray,    # (B, M, 4) xyxy pixels
    rng: jax.Array,
    *,
    prob: float = 0.5,
) -> "Tuple[jnp.ndarray, jnp.ndarray]":
    """Per-image horizontal flip with box mirroring (static shapes)."""
    b, _, w, _ = images.shape
    flip = jax.random.uniform(rng, (b,)) < prob
    flipped = images[:, :, ::-1, :]
    images = jnp.where(flip[:, None, None, None], flipped, images)
    x1 = boxes[..., 0]
    x2 = boxes[..., 2]
    fx1 = (w - 1) - x2
    fx2 = (w - 1) - x1
    new_boxes = jnp.stack(
        [
            jnp.where(flip[:, None], fx1, x1),
            boxes[..., 1],
            jnp.where(flip[:, None], fx2, x2),
            boxes[..., 3],
        ],
        axis=-1,
    )
    return images, new_boxes


def train_augment(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    rng: jax.Array,
    *,
    hsv: bool = True,
    hflip_prob: float = 0.5,
) -> "Tuple[jnp.ndarray, jnp.ndarray]":
    """The protocol-legal augmentation bundle (photometric + hflip only)."""
    k1, k2 = jax.random.split(rng)
    if hsv:
        images = hsv_jitter(images, k1)
    if hflip_prob > 0:
        images, boxes = random_hflip(images, boxes, k2, prob=hflip_prob)
    return images, boxes
