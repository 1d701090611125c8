"""Tests for deformable attention, Hungarian matching, and RT-DETR."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_moe_tpu.losses.hungarian import detr_loss, hungarian_match
from multimodal_moe_tpu.ops.deformable import ms_deformable_attention


def _naive_deformable(values, level_shapes, locations, weights):
    """Per-point python reference (zero-padding bilinear, align_corners=False)."""
    b, total, n_heads, head_dim = values.shape
    _, q, _, n_levels, n_points, _ = locations.shape
    offsets = [0]
    for h, w in level_shapes[:-1]:
        offsets.append(offsets[-1] + h * w)
    out = np.zeros((b, q, n_heads, head_dim))
    v = np.asarray(values, np.float64)
    loc = np.asarray(locations, np.float64)
    wgt = np.asarray(weights, np.float64)
    for bi in range(b):
        for qi in range(q):
            for hi in range(n_heads):
                acc = np.zeros(head_dim)
                for li, (lh, lw) in enumerate(level_shapes):
                    for pi in range(n_points):
                        x = loc[bi, qi, hi, li, pi, 0] * lw - 0.5
                        y = loc[bi, qi, hi, li, pi, 1] * lh - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        wx, wy = x - x0, y - y0
                        val = np.zeros(head_dim)
                        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                            cx, cy = x0 + dx, y0 + dy
                            if 0 <= cx < lw and 0 <= cy < lh:
                                corner_w = (wx if dx else 1 - wx) * (wy if dy else 1 - wy)
                                val += corner_w * v[bi, offsets[li] + cy * lw + cx, hi]
                        acc += wgt[bi, qi, hi, li, pi] * val
                out[bi, qi, hi] = acc
    return out.reshape(b, q, n_heads * head_dim)


class TestDeformableAttention:
    def test_matches_naive_reference(self):
        rng = np.random.default_rng(0)
        level_shapes = [(8, 12), (4, 6), (2, 3)]
        total = sum(h * w for h, w in level_shapes)
        b, q, heads, dim, pts = 2, 5, 2, 4, 3
        values = jnp.asarray(rng.normal(size=(b, total, heads, dim)), jnp.float32)
        loc = jnp.asarray(rng.uniform(-0.1, 1.1, (b, q, heads, 3, pts, 2)), jnp.float32)
        w = rng.uniform(0, 1, (b, q, heads, 3, pts))
        w = jnp.asarray(w / w.sum((-1, -2), keepdims=True), jnp.float32)
        got = ms_deformable_attention(values, level_shapes, loc, w)
        want = _naive_deformable(values, level_shapes, loc, w)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_exact_pixel_center(self):
        # Sampling at the center of pixel (1, 2) of a 4×4 level returns it.
        level_shapes = [(4, 4)]
        values = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1, 1)
        loc = jnp.array([(2 + 0.5) / 4, (1 + 0.5) / 4], jnp.float32).reshape(1, 1, 1, 1, 1, 2)
        w = jnp.ones((1, 1, 1, 1, 1), jnp.float32)
        out = ms_deformable_attention(values, level_shapes, loc, w)
        assert float(out[0, 0, 0]) == pytest.approx(1 * 4 + 2)

    def test_out_of_bounds_zero(self):
        level_shapes = [(4, 4)]
        values = jnp.ones((1, 16, 1, 1), jnp.float32)
        loc = jnp.full((1, 1, 1, 1, 1, 2), 2.0, jnp.float32)  # far outside
        w = jnp.ones((1, 1, 1, 1, 1), jnp.float32)
        out = ms_deformable_attention(values, level_shapes, loc, w)
        assert float(out[0, 0, 0]) == 0.0

    def test_differentiable(self):
        rng = np.random.default_rng(1)
        level_shapes = [(4, 4)]
        values = jnp.asarray(rng.normal(size=(1, 16, 2, 4)), jnp.float32)
        loc = jnp.asarray(rng.uniform(0.2, 0.8, (1, 3, 2, 1, 2, 2)), jnp.float32)
        w = jnp.full((1, 3, 2, 1, 2), 0.5, jnp.float32)

        def f(v, l):
            return ms_deformable_attention(v, level_shapes, l, w).sum()

        gv, gl = jax.grad(f, argnums=(0, 1))(values, loc)
        assert np.isfinite(np.asarray(gv)).all() and np.abs(np.asarray(gv)).sum() > 0
        assert np.isfinite(np.asarray(gl)).all() and np.abs(np.asarray(gl)).sum() > 0


class TestHungarian:
    def test_obvious_assignment(self):
        # 3 queries, 2 GTs: query boxes 0/1 coincide with GTs 0/1.
        pred_boxes = jnp.array([[[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.1, 0.1], [0.5, 0.5, 0.5, 0.5]]])
        pred_logits = jnp.full((1, 3, 1), 3.0)
        gt_boxes = jnp.array([[[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.1, 0.1]]])
        gt_labels = jnp.zeros((1, 2), jnp.int32)
        gt_mask = jnp.ones((1, 2), bool)
        assigned = hungarian_match(pred_logits, pred_boxes, gt_labels, gt_boxes, gt_mask)
        assert assigned[0].tolist() == [0, 1]

    def test_padded_gt_does_not_steal(self):
        pred_boxes = jnp.array([[[0.2, 0.2, 0.1, 0.1], [0.9, 0.9, 0.05, 0.05]]])
        pred_logits = jnp.full((1, 2, 1), 0.0)
        gt_boxes = jnp.array([[[0.2, 0.2, 0.1, 0.1], [0.0, 0.0, 0.0, 0.0]]])
        gt_labels = jnp.zeros((1, 2), jnp.int32)
        gt_mask = jnp.array([[True, False]])
        assigned = hungarian_match(pred_logits, pred_boxes, gt_labels, gt_boxes, gt_mask)
        assert int(assigned[0, 0]) == 0  # real GT gets its query

    def test_works_under_jit(self):
        @jax.jit
        def run(logits, boxes, gl, gb, gm):
            return hungarian_match(logits, boxes, gl, gb, gm)

        out = run(
            jnp.zeros((2, 4, 1)),
            jnp.full((2, 4, 4), 0.5),
            jnp.zeros((2, 2), jnp.int32),
            jnp.full((2, 2, 4), 0.4),
            jnp.ones((2, 2), bool),
        )
        assert out.shape == (2, 2)


class TestRTDETR:
    @pytest.fixture(scope="class")
    def tiny(self):
        from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

        model = RTDETRDetector(
            num_classes=1,
            hidden_dim=64,
            num_queries=20,
            num_decoder_layers=2,
            num_heads=4,
            backbone_depths=(1, 1, 1, 1),
        )
        variables = jax.jit(
            lambda r: model.init(r, jnp.zeros((1, 64, 128, 3)), train=False)
        )(jax.random.PRNGKey(0))
        return model, variables

    def test_forward_shapes(self, tiny):
        model, variables = tiny
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.zeros((2, 64, 128, 3))
        )
        assert out["pred_logits"].shape == (2, 20, 1)
        assert out["pred_boxes"].shape == (2, 20, 4)
        assert out["boxes"].shape == (2, 20, 4)
        assert len(out["aux_outputs"]) == 1
        # normalized boxes in (0, 1)
        pb = np.asarray(out["pred_boxes"])
        assert (pb > 0).all() and (pb < 1).all()
        # pixel boxes plausible
        bx = np.asarray(out["boxes"])
        assert (bx[..., 2] >= bx[..., 0]).all()

    def test_csp_arch_ablation_forward(self):
        # arch="csp" keeps the round-1 CCFF fusion stages buildable
        from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

        model = RTDETRDetector(
            num_classes=1, hidden_dim=64, num_queries=8,
            num_decoder_layers=1, num_heads=4,
            backbone_depths=(1, 1, 1, 1), arch="csp",
        )
        variables = jax.jit(
            lambda r: model.init(r, jnp.zeros((1, 64, 128, 3)), train=False)
        )(jax.random.PRNGKey(0))
        out = model.apply(variables, jnp.zeros((1, 64, 128, 3)), train=False)
        assert out["pred_logits"].shape == (1, 8, 1)
        # the two archs produce different fusion-stage parameter trees
        assert "td3" in variables["params"]["encoder"]

    def test_denoising_branch(self, tiny):
        from multimodal_moe_tpu.models.rtdetr import rtdetr_loss

        model, variables = tiny
        gt_boxes = jnp.array([[[10.0, 10.0, 50.0, 40.0], [70.0, 20.0, 110.0, 60.0]]])
        gt_mask = jnp.array([[True, True]])
        images = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 128, 3))
        out, _ = model.apply(
            variables,
            images,
            train=True,
            gt_boxes=gt_boxes,
            gt_mask=gt_mask,
            rngs={"denoise": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        assert "dn_outputs" in out
        d = out["dn_outputs"][0]["pred_boxes"].shape[1]
        assert d == 2 * model.num_denoising_groups * 2  # 2G·M with M=2
        # matching part unchanged in width
        assert out["pred_boxes"].shape == (1, 20, 4)

        total, metrics = rtdetr_loss(
            out, jnp.zeros((1, 2), jnp.int32), gt_boxes, gt_mask, img_hw=(64, 128)
        )
        assert "dn_loss" in metrics
        assert np.isfinite(float(total)) and np.isfinite(float(metrics["dn_loss"]))

    def test_no_denoising_at_eval(self, tiny):
        model, variables = tiny
        out = model.apply(variables, jnp.zeros((1, 64, 128, 3)), train=False)
        assert "dn_outputs" not in out

    def test_loss_and_grads(self, tiny):
        from multimodal_moe_tpu.models.rtdetr import rtdetr_loss

        model, variables = tiny
        gt_boxes = jnp.array(
            [[[10.0, 10.0, 50.0, 40.0], [70.0, 20.0, 110.0, 60.0]]]
        )
        gt_labels = jnp.zeros((1, 2), jnp.int32)
        gt_mask = jnp.ones((1, 2), bool)
        images = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 128, 3))

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images,
                train=False,
            )
            total, metrics = rtdetr_loss(
                out, gt_labels, gt_boxes, gt_mask, img_hw=(64, 128)
            )
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(total))
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
        assert nonzero > len(leaves) * 0.5  # most params receive gradient

        # Regression (round-1 advisor, high): the encoder query-selection
        # heads must receive gradient via the enc_outputs aux loss layer —
        # without it IoU-aware top-k selection scores with a frozen random
        # projection forever.
        for head in ("enc_score", "enc_bbox"):
            g = sum(
                float(jnp.abs(l).sum()) for l in jax.tree.leaves(grads[head])
            )
            assert g > 0, f"{head} received zero gradient"

    def test_cdn_mask_asymmetric(self):
        from multimodal_moe_tpu.models.rtdetr import build_denoising_queries

        gt = jnp.full((1, 3, 4), 0.5)
        mask_gt = jnp.ones((1, 3), bool)
        _, _, attn = build_denoising_queries(
            jax.random.PRNGKey(0), gt, mask_gt, num_groups=2, num_matching=5
        )
        d = 2 * 2 * 3
        attn = np.asarray(attn)
        # matching → dn blocked
        assert not attn[d:, :d].any()
        # dn → matching allowed (RT-DETRv2/DINO asymmetry)
        assert attn[:d, d:].all()
        # cross-group dn blocked, within-group allowed
        assert attn[: 2 * 3, : 2 * 3].all()
        assert not attn[: 2 * 3, 2 * 3 : d].any()
        # matching sees matching
        assert attn[d:, d:].all()


class TestRemat:
    """remat=True must be numerically identical (fwd and grads) — it only
    changes what the backward pass holds vs recomputes."""

    def test_remat_matches_baseline(self):
        from multimodal_moe_tpu.models.rtdetr import RTDETRDetector

        def build(remat):
            m = RTDETRDetector(
                num_classes=1, hidden_dim=64, num_queries=8,
                num_decoder_layers=1, num_heads=4,
                backbone_depths=(1, 1, 1, 1), num_denoising_groups=0,
                remat=remat,
            )
            v = jax.jit(
                lambda r: m.init(r, jnp.zeros((1, 64, 128, 3)), train=True)
            )(jax.random.PRNGKey(0))
            return m, v

        m0, v0 = build(False)
        m1, v1 = build(True)
        # identical param trees (remat wraps, does not rename)
        chex.assert_trees_all_close(v0["params"], v1["params"])

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128, 3))

        def loss(m):
            def f(params, variables):
                out, _ = m.apply(
                    {**variables, "params": params}, x, train=True,
                    mutable=["batch_stats"],
                )
                return jnp.sum(out["pred_logits"].astype(jnp.float32) ** 2) + jnp.sum(
                    out["pred_boxes"].astype(jnp.float32) ** 2
                )
            return f

        l0, g0 = jax.value_and_grad(loss(m0))(v0["params"], v0)
        l1, g1 = jax.value_and_grad(loss(m1))(v1["params"], v1)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        # Recompute reassociates float reductions — grads match to ~1e-4
        # (measured max abs diff 8e-5 at loss ~260), not bit-exactly.
        chex.assert_trees_all_close(g0, g1, rtol=1e-3, atol=1e-3)
