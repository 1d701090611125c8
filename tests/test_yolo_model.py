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


class TestRemat:
    """remat=True must be numerically identical (fwd and grads) and produce
    byte-identical param paths — it only changes what the backward pass
    holds vs recomputes (models/yolo.py _stage_classes/_AutoNamer). Guards
    the checkpoint-interchangeability contract: a run trained --remat must
    restore into a non-remat eval graph and vice versa."""

    @pytest.mark.parametrize("arch", ["tpu", "csp"])
    def test_yolo_remat_matches_baseline(self, arch):
        def build(remat):
            m = YoloDetector(num_classes=1, variant="n", arch=arch, remat=remat)
            v = jax.jit(
                lambda r: m.init(r, jnp.zeros((1, H, W, 3)), train=True)
            )(jax.random.PRNGKey(0))
            return m, v

        m0, v0 = build(False)
        m1, v1 = build(True)
        # identical param trees: same paths (explicit names reproduce flax
        # auto-naming) and same values (same rng stream).
        assert jax.tree_util.tree_structure(v0["params"]) == jax.tree_util.tree_structure(v1["params"])
        np.testing.assert_allclose(
            float(
                sum(jnp.sum(jnp.abs(a - b)) for a, b in zip(
                    jax.tree_util.tree_leaves(v0["params"]),
                    jax.tree_util.tree_leaves(v1["params"]),
                ))
            ),
            0.0,
        )

        x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3))

        def loss_fn(m):
            def f(params, variables):
                out, _ = m.apply(
                    {**variables, "params": params}, x, train=True,
                    mutable=["batch_stats"],
                )
                return (
                    jnp.sum(out["cls_logits"] ** 2)
                    + 1e-3 * jnp.sum(out["box_logits"] ** 2)
                )
            return f

        l0, g0 = jax.value_and_grad(loss_fn(m0))(v0["params"], v0)
        l1, g1 = jax.value_and_grad(loss_fn(m1))(v1["params"], v1)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        # Recompute reassociates float reductions — close, not bit-exact.
        import chex

        chex.assert_trees_all_close(g0, g1, rtol=1e-3, atol=1e-3)

    def test_moe_yolo_remat_param_paths_and_fwd(self):
        from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector

        def build(remat):
            m = MoEYoloDetector(
                num_classes=1, variant="n", num_experts=2, remat=remat
            )
            v = jax.jit(
                lambda r: m.init(r, jnp.zeros((1, H, W, 3)), train=False)
            )(jax.random.PRNGKey(0))
            return m, v

        m0, v0 = build(False)
        m1, v1 = build(True)
        assert jax.tree_util.tree_structure(v0["params"]) == jax.tree_util.tree_structure(v1["params"])
        x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3))
        o0 = m0.apply(v0, x, train=False)
        o1 = m1.apply(v1, x, train=False)
        np.testing.assert_allclose(
            np.asarray(o0["cls_logits"]), np.asarray(o1["cls_logits"]), rtol=1e-5, atol=1e-5
        )
