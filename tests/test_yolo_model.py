"""Tests for the Flax YOLO detector + task-aligned loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_moe_tpu.losses.tal import assign_targets, yolo_loss
from multimodal_moe_tpu.models.yolo import (
    REG_MAX,
    YoloDetector,
    count_params,
    make_anchors,
    scaled_channels,
)

H, W = 64, 128  # tiny canvas: anchors = 128 + 32 + 8 = 168


@pytest.fixture(scope="module")
def model_and_vars():
    model = YoloDetector(num_classes=1, variant="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    return model, variables


def _gt_batch(b=2, m=4):
    gt_boxes = np.zeros((b, m, 4), np.float32)
    gt_labels = np.zeros((b, m), np.int32)
    gt_mask = np.zeros((b, m), bool)
    gt_boxes[0, 0] = [20, 10, 60, 50]
    gt_boxes[0, 1] = [80, 20, 120, 60]
    gt_mask[0, :2] = True
    gt_boxes[1, 0] = [5, 5, 40, 40]
    gt_mask[1, 0] = True
    return jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(gt_mask)


class TestAnchors:
    def test_counts_and_strides(self):
        pts, strides = make_anchors(H, W)
        assert pts.shape == (168, 2)
        assert (strides == 8).sum() == 128
        assert (strides == 32).sum() == 8
        # First stride-8 anchor sits at the cell center.
        np.testing.assert_allclose(pts[0], [4.0, 4.0])

    def test_protocol_resolution(self):
        pts, _ = make_anchors(704, 1248)
        assert pts.shape[0] == 88 * 156 + 44 * 78 + 22 * 39


class TestModel:
    def test_forward_shapes(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((2, H, W, 3)), train=False)
        assert out["box_logits"].shape == (2, 168, 4 * REG_MAX)
        assert out["cls_logits"].shape == (2, 168, 1)
        assert out["boxes"].shape == (2, 168, 4)

    def test_decoded_boxes_are_plausible(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((1, H, W, 3)), train=False)
        boxes = np.asarray(out["boxes"][0])
        assert np.all(boxes[:, 2] >= boxes[:, 0])
        assert np.all(boxes[:, 3] >= boxes[:, 1])

    def test_variant_scaling(self):
        sizes = {}
        for v in ("n", "s"):
            model = YoloDetector(num_classes=1, variant=v)
            variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
            sizes[v] = count_params(variables["params"])
        assert sizes["n"] < sizes["s"]
        assert all(c % 8 == 0 for c in scaled_channels("s"))

    def test_batchnorm_stats_update(self, model_and_vars):
        model, variables = model_and_vars
        out, mutated = model.apply(
            variables,
            jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3)),
            train=True,
            mutable=["batch_stats"],
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(before, after))


class TestAssignment:
    def test_fg_anchors_inside_gt(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((2, H, W, 3)), train=False)
        labels, boxes, mask = _gt_batch()
        assign = assign_targets(
            jax.nn.sigmoid(out["cls_logits"]),
            out["boxes"],
            out["anchor_points"],
            labels,
            boxes,
            mask,
        )
        pts = np.asarray(out["anchor_points"])
        fg = np.asarray(assign.fg_mask)
        assert fg[0].sum() > 0 and fg[1].sum() > 0
        # Every foreground anchor center lies inside its assigned GT box.
        tb = np.asarray(assign.target_boxes)
        for bi in range(2):
            for ai in np.where(fg[bi])[0]:
                x, y = pts[ai]
                x1, y1, x2, y2 = tb[bi, ai]
                assert x1 < x < x2 and y1 < y < y2

    def test_empty_gt_no_fg(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((1, H, W, 3)), train=False)
        labels = jnp.zeros((1, 4), jnp.int32)
        boxes = jnp.zeros((1, 4, 4))
        mask = jnp.zeros((1, 4), bool)
        assign = assign_targets(
            jax.nn.sigmoid(out["cls_logits"]), out["boxes"],
            out["anchor_points"], labels, boxes, mask,
        )
        assert not bool(assign.fg_mask.any())
        assert float(assign.target_scores.sum()) == 0.0


class TestLoss:
    def test_loss_finite_and_grads_flow(self, model_and_vars):
        model, variables = model_and_vars
        labels, boxes, mask = _gt_batch()
        images = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, 3))

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images,
                train=False,
            )
            total, metrics = yolo_loss(out, labels, boxes, mask)
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(total))
        assert float(metrics["num_fg"]) > 0
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(l)) for l in leaves)
        assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0

    def test_loss_decreases_when_overfitting(self, model_and_vars):
        import optax

        model, variables = model_and_vars
        labels, boxes, mask = _gt_batch()
        images = jax.random.normal(jax.random.PRNGKey(3), (2, H, W, 3))
        params = variables["params"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                out = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    images,
                    train=False,
                )
                return yolo_loss(out, labels, boxes, mask)[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        first = None
        for i in range(8):
            params, opt_state, loss = step(params, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < first

    def test_empty_gt_loss_finite(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((1, H, W, 3)), train=False)
        total, metrics = yolo_loss(
            out,
            jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4, 4)),
            jnp.zeros((1, 4), bool),
        )
        assert np.isfinite(float(total))
        assert float(metrics["num_fg"]) == 0


def test_space_to_depth_matches_transpose_formulation():
    """The strided-slice s2d (TPU layout-copy fix) must stay bit-identical
    to the classic reshape/transpose/reshape with (dy, dx, c) channels."""
    import numpy as np
    import jax.numpy as jnp

    from multimodal_moe_tpu.models.layers import space_to_depth

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 3)).astype(np.float32))
    r = 4
    b, h, w, c = x.shape
    ref = (
        x.reshape(b, h // r, r, w // r, r, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // r, w // r, r * r * c)
    )
    got = space_to_depth(x, r)
    assert got.shape == ref.shape
    assert float(jnp.max(jnp.abs(got - ref))) == 0.0
