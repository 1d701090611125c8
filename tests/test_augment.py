"""Tests for device-side training augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_moe_tpu.ops.augment import (
    hsv_jitter,
    hsv_to_rgb,
    random_hflip,
    rgb_to_hsv,
    train_augment,
)


class TestHsv:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)), jnp.float32)
        back = hsv_to_rgb(rgb_to_hsv(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    def test_jitter_changes_but_stays_in_range(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(0.2, 0.8, (2, 16, 16, 3)), jnp.float32)
        out = hsv_jitter(imgs, jax.random.PRNGKey(0))
        assert out.shape == imgs.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        assert not np.allclose(np.asarray(out), np.asarray(imgs))

    def test_zero_gains_identity(self):
        imgs = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
        out = hsv_jitter(imgs, jax.random.PRNGKey(0), h_gain=0, s_gain=0, v_gain=0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


class TestHFlip:
    def test_flip_mirrors_image_and_boxes(self):
        w = 16
        imgs = jnp.asarray(np.arange(2 * 8 * w * 3).reshape(2, 8, w, 3), jnp.float32)
        boxes = jnp.asarray([[[2.0, 1.0, 5.0, 4.0]], [[2.0, 1.0, 5.0, 4.0]]])
        out_i, out_b = random_hflip(imgs, boxes, jax.random.PRNGKey(0), prob=1.0)
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(imgs[:, :, ::-1, :]))
        np.testing.assert_allclose(
            np.asarray(out_b[0, 0]), [(w - 1) - 5.0, 1.0, (w - 1) - 2.0, 4.0]
        )
        # width preserved, order preserved
        assert float(out_b[0, 0, 2] - out_b[0, 0, 0]) == 3.0

    def test_prob_zero_identity(self):
        imgs = jnp.ones((2, 8, 16, 3))
        boxes = jnp.ones((2, 3, 4))
        out_i, out_b = random_hflip(imgs, boxes, jax.random.PRNGKey(0), prob=0.0)
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(boxes))

    def test_double_flip_identity(self):
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.uniform(0, 1, (1, 8, 16, 3)), jnp.float32)
        boxes = jnp.asarray([[[2.0, 1.0, 5.0, 4.0]]])
        i1, b1 = random_hflip(imgs, boxes, jax.random.PRNGKey(0), prob=1.0)
        i2, b2 = random_hflip(i1, b1, jax.random.PRNGKey(1), prob=1.0)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(imgs))
        np.testing.assert_allclose(np.asarray(b2), np.asarray(boxes))


class TestBundle:
    def test_jit_compatible(self):
        imgs = jnp.ones((2, 16, 32, 3)) * 0.5
        boxes = jnp.asarray([[[2.0, 1.0, 5.0, 4.0]]] * 2)

        @jax.jit
        def f(i, b, r):
            return train_augment(i, b, r)

        out_i, out_b = f(imgs, boxes, jax.random.PRNGKey(0))
        assert out_i.shape == imgs.shape and out_b.shape == boxes.shape
        assert np.isfinite(np.asarray(out_i)).all()
