"""Tests for the context-routed MoE layer + MoE-YOLO detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_moe_tpu.data.solar import NUM_SOLAR_BINS
from multimodal_moe_tpu.models.moe import ContextRouter, MoEFFN, route_top_k
from multimodal_moe_tpu.models.moe_yolo import MoEYoloDetector, moe_yolo_loss


class TestRouteTopK:
    def test_topk_selected_and_normalized(self):
        logits = jnp.array([[3.0, 2.0, 1.0, 0.0], [0.0, 1.0, 2.0, 3.0]])
        r = route_top_k(logits, k=2, capacity=2)
        combine = np.asarray(r.combine.sum(-1))  # (T, E) weights
        assert combine[0, 0] > combine[0, 1] > 0
        assert combine[0, 2] == combine[0, 3] == 0
        np.testing.assert_allclose(combine.sum(-1), 1.0, rtol=1e-5)

    def test_capacity_drops_overflow(self):
        # 4 tokens all prefer expert 0; capacity 2 → tokens 2,3 dropped there.
        logits = jnp.tile(jnp.array([[5.0, 1.0]]), (4, 1))
        r = route_top_k(logits, k=1, capacity=2)
        kept = np.asarray(r.dispatch[:, 0].any(-1))
        assert kept.tolist() == [True, True, False, False]

    def test_dispatch_positions_unique(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(32, 4)))
        r = route_top_k(logits, k=2, capacity=16)
        # each (expert, slot) holds at most one token
        per_slot = np.asarray(r.dispatch).sum(0)  # (E, C)
        assert per_slot.max() <= 1

    def test_aux_loss_balanced_lower_than_collapsed(self):
        t, e = 64, 4
        rng = np.random.default_rng(1)
        balanced = jnp.asarray(rng.normal(0, 0.01, (t, e)))
        collapsed = jnp.asarray(rng.normal(0, 0.01, (t, e))).at[:, 0].add(10.0)
        r_bal = route_top_k(balanced, k=1, capacity=t)
        r_col = route_top_k(collapsed, k=1, capacity=t)
        assert float(r_bal.aux_loss) < float(r_col.aux_loss)

    def test_expert_load_sums_to_k(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(128, 8)))
        r = route_top_k(logits, k=2, capacity=64)
        np.testing.assert_allclose(float(r.expert_load.sum()), 2.0, rtol=1e-5)


class TestSparseDispatch:
    """The O(T·k) sort/scatter path must match the dense (T,E,C) einsum path."""

    def test_sparse_matches_dense(self):
        dense = MoEFFN(num_experts=4, k=2, dispatch="dense")
        sparse = MoEFFN(num_experts=4, k=2, dispatch="sparse")
        tokens = jax.random.normal(jax.random.PRNGKey(0), (96, 16))
        ctx = jnp.zeros(96, jnp.int32)
        variables = dense.init(jax.random.PRNGKey(1), tokens, ctx)
        out_d, aux_d = dense.apply(variables, tokens, ctx)
        out_s, aux_s = sparse.apply(variables, tokens, ctx)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), atol=1e-5)
        np.testing.assert_allclose(
            float(aux_d["moe_aux_loss"]), float(aux_s["moe_aux_loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(aux_d["expert_load"]), np.asarray(aux_s["expert_load"]), rtol=1e-5
        )

    def test_sparse_capacity_drops(self):
        from multimodal_moe_tpu.models.moe import route_top_k_sparse

        logits = jnp.tile(jnp.array([[5.0, 1.0]]), (4, 1))
        rd = route_top_k_sparse(logits, k=1, capacity=2)
        assert rd.valid[:, 0].tolist() == [True, True, False, False]

    def test_sparse_grads_flow(self):
        ffn = MoEFFN(num_experts=2, k=2, dispatch="sparse", capacity_factor=2.0)
        tokens = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
        ctx = jnp.zeros(32, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)

        def loss(params):
            out, aux = ffn.apply({"params": params}, tokens, ctx)
            return (out**2).mean() + aux["moe_aux_loss"]

        grads = jax.grad(loss)(variables["params"])
        for w in ("experts_w1", "experts_w2"):
            assert float(jnp.abs(grads[w]).sum()) > 0

    def test_auto_switches_on_token_count(self):
        # Under jit with T > limit, auto must pick sparse (no (T,E,C) tensor).
        ffn = MoEFFN(num_experts=4, k=2, dispatch="auto")
        t = 8192
        tokens = jax.random.normal(jax.random.PRNGKey(0), (t, 8))
        ctx = jnp.zeros(t, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)
        out, aux = jax.jit(ffn.apply)(variables, tokens, ctx)
        assert out.shape == (t, 8)
        assert np.isfinite(float(aux["moe_aux_loss"]))


class TestContextRouter:
    def test_context_bias_changes_routing(self):
        router = ContextRouter(num_experts=4, k=1)
        tokens = jnp.ones((16, 8))
        ctx0 = jnp.zeros(16, jnp.int32)
        variables = router.init(jax.random.PRNGKey(0), tokens, ctx0)
        # Put a big bias on expert 3 for context bin 1.
        variables = jax.tree_util.tree_map_with_path(
            lambda p, x: x.at[1, 3].add(100.0)
            if "context_bias" in jax.tree_util.keystr(p)
            else x,
            variables,
        )
        r0 = router.apply(variables, tokens, ctx0)
        r1 = router.apply(variables, tokens, jnp.ones(16, jnp.int32))
        assert float(r1.expert_load[3]) == 1.0  # all tokens → expert 3
        assert float(r0.expert_load[3]) < 1.0

    def test_gate_params_fp32(self):
        router = ContextRouter(num_experts=4)
        variables = router.init(
            jax.random.PRNGKey(0), jnp.ones((4, 8), jnp.bfloat16), jnp.zeros(4, jnp.int32)
        )
        leaves = jax.tree.leaves(variables["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)


class TestMoEFFN:
    def test_forward_and_residual(self):
        ffn = MoEFFN(num_experts=4, k=2)
        tokens = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
        ctx = jnp.zeros(64, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)
        out, aux = ffn.apply(variables, tokens, ctx)
        assert out.shape == tokens.shape
        assert np.isfinite(float(aux["moe_aux_loss"]))
        assert aux["expert_load"].shape == (4,)

    def test_grads_reach_all_experts(self):
        ffn = MoEFFN(num_experts=2, k=2, capacity_factor=2.0)
        tokens = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
        ctx = jnp.zeros(32, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)

        def loss(params):
            out, aux = ffn.apply({"params": params}, tokens, ctx)
            return (out**2).mean() + aux["moe_aux_loss"]

        grads = jax.grad(loss)(variables["params"])
        w1g = grads["experts_w1"]
        assert float(jnp.abs(w1g[0]).sum()) > 0
        assert float(jnp.abs(w1g[1]).sum()) > 0

    def test_works_under_jit(self):
        ffn = MoEFFN(num_experts=4)
        tokens = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
        ctx = jnp.zeros(64, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)
        out, aux = jax.jit(ffn.apply)(variables, tokens, ctx)
        assert out.shape == (64, 16)


class TestMoEYolo:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = MoEYoloDetector(num_classes=1, variant="n", num_experts=2)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 128, 3)),
            train=False,
            context_ids=jnp.zeros(1, jnp.int32),
        )
        return model, variables

    def test_forward_shapes_and_aux(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(
            variables,
            jnp.zeros((2, 64, 128, 3)),
            train=False,
            context_ids=jnp.zeros(2, jnp.int32),
        )
        assert out["boxes"].shape == (2, 168, 4)
        assert np.isfinite(float(out["moe_aux_loss"]))
        assert out["expert_load"].shape == (3, 2)  # 3 levels × 2 experts

    def test_loss_includes_aux(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(
            variables,
            jnp.zeros((1, 64, 128, 3)),
            train=False,
            context_ids=jnp.zeros(1, jnp.int32),
        )
        gt_boxes = jnp.array([[[10.0, 10.0, 50.0, 40.0]] + [[0.0] * 4] * 3])
        gt_labels = jnp.zeros((1, 4), jnp.int32)
        gt_mask = jnp.array([[True, False, False, False]])
        total, metrics = moe_yolo_loss(out, gt_labels, gt_boxes, gt_mask)
        assert "moe_aux_loss" in metrics
        assert float(total) >= float(
            metrics["box_loss"] * 0
        )  # finite & composed
        assert np.isfinite(float(total))

    def test_context_changes_output(self, model_and_vars):
        model, variables = model_and_vars
        # Nudge context bias so bins differ, then outputs must differ.
        variables = jax.tree_util.tree_map_with_path(
            lambda p, x: x + 5.0
            if "context_bias" in jax.tree_util.keystr(p)
            and hasattr(x, "at")
            and x.ndim == 2
            else x,
            variables,
        )
        img = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 128, 3))
        out0 = model.apply(
            variables, img, train=False, context_ids=jnp.array([0], jnp.int32)
        )
        out1 = model.apply(
            variables, img, train=False, context_ids=jnp.array([2], jnp.int32)
        )
        # same weights, different context → different routing is possible;
        # at minimum the model runs and both are finite
        assert np.isfinite(np.asarray(out0["cls_logits"])).all()
        assert np.isfinite(np.asarray(out1["cls_logits"])).all()


class TestMoEOnMesh:
    def test_expert_sharded_train_step(self):
        """Full MoE train step on a (4 data × 2 expert) mesh."""
        from multimodal_moe_tpu.parallel.mesh import create_mesh
        from multimodal_moe_tpu.train.detection import DetTrainConfig, DetectionTrainer

        mesh = create_mesh(num_expert=2)
        model = MoEYoloDetector(num_classes=1, variant="n", num_experts=2)
        cfg = DetTrainConfig(variant="n", img_h=64, img_w=128, epochs=1, batch=8)
        trainer = DetectionTrainer(
            model, cfg, loss_fn=moe_yolo_loss, mesh=mesh, steps_per_epoch=1
        )
        state = trainer.init_state()

        rng = np.random.default_rng(0)
        batch = {
            "image": rng.integers(0, 255, (8, 64, 128, 3)).astype(np.uint8),
            "gt_boxes": np.tile(
                np.array([[[10, 10, 50, 40]] + [[0, 0, 0, 0]] * 3], np.float32),
                (8, 1, 1),
            ),
            "gt_labels": np.zeros((8, 4), np.int32),
            "gt_mask": np.tile(np.array([[True, False, False, False]]), (8, 1)),
            "solar_bin": np.arange(8, dtype=np.int32) % NUM_SOLAR_BINS,
        }
        state, metrics = trainer.train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert "moe_aux_loss" in metrics
        assert int(state.step) == 1


class TestGmmDispatch:
    """Dropless grouped-GEMM dispatch (moe_apply_gmm / dispatch='gmm')."""

    def _dropless_reference(self, tokens, logits, k, w1, b1, w2, b2):
        """Every token reaches all its top-k experts — no capacity."""
        from multimodal_moe_tpu.models.moe import route_top_k_dropless

        idx, gates, aux, load = route_top_k_dropless(logits, k=k)
        t, d = tokens.shape
        out = jnp.zeros_like(tokens)
        for slot in range(k):
            e_w1 = w1[idx[:, slot]]
            e_b1 = b1[idx[:, slot], 0]
            e_w2 = w2[idx[:, slot]]
            e_b2 = b2[idx[:, slot], 0]
            mid = jax.nn.silu(jnp.einsum("td,tdh->th", tokens, e_w1) + e_b1)
            y = jnp.einsum("th,thd->td", mid, e_w2) + e_b2
            out = out + y * gates[:, slot:slot + 1]
        return out, aux, load

    def test_gmm_matches_dropless_reference(self):
        from multimodal_moe_tpu.models.moe import (
            moe_apply_gmm, route_top_k_dropless)

        rng = jax.random.PRNGKey(0)
        t, d, h, e, k = 64, 16, 32, 4, 2
        tokens = jax.random.normal(rng, (t, d))
        logits = jax.random.normal(jax.random.PRNGKey(1), (t, e))
        w1 = jax.random.normal(jax.random.PRNGKey(2), (e, d, h)) * 0.1
        b1 = jax.random.normal(jax.random.PRNGKey(3), (e, 1, h)) * 0.1
        w2 = jax.random.normal(jax.random.PRNGKey(4), (e, h, d)) * 0.1
        b2 = jax.random.normal(jax.random.PRNGKey(5), (e, 1, d)) * 0.1

        idx, gates, _, _ = route_top_k_dropless(logits, k=k)
        out = moe_apply_gmm(tokens, idx, gates, w1, b1, w2, b2, interpret=True)
        ref, _, _ = self._dropless_reference(tokens, logits, k, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gmm_mode_in_ffn(self):
        ffn = MoEFFN(num_experts=4, k=2, dispatch="gmm")
        tokens = jax.random.normal(jax.random.PRNGKey(0), (96, 16))
        ctx = jnp.zeros(96, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)
        out, aux = jax.jit(ffn.apply)(variables, tokens, ctx)
        assert out.shape == (96, 16)
        assert np.isfinite(float(aux["moe_aux_loss"]))
        assert np.isclose(float(aux["expert_load"].sum()), 2.0, rtol=1e-5)

    def test_gmm_no_drops_under_collapse(self):
        """All tokens pick one expert: capacity paths drop, gmm must not."""
        from multimodal_moe_tpu.models.moe import (
            moe_apply_gmm, route_top_k_dropless)

        t, d, h, e = 32, 8, 16, 4
        tokens = jnp.ones((t, d))
        logits = jnp.tile(jnp.array([[9.0, 0.0, 0.0, 0.0]]), (t, 1))
        idx, gates, _, _ = route_top_k_dropless(logits, k=1)
        w1 = jnp.ones((e, d, h)) * 0.01
        b1 = jnp.zeros((e, 1, h))
        w2 = jnp.ones((e, h, d)) * 0.01
        b2 = jnp.zeros((e, 1, d))
        out = moe_apply_gmm(tokens, idx, gates, w1, b1, w2, b2, interpret=True)
        # Every row identical and nonzero — nothing hit a capacity wall.
        assert float(jnp.abs(out).min()) > 0
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[-1]), rtol=1e-6)

    def test_gmm_grads_flow(self):
        ffn = MoEFFN(num_experts=3, k=2, dispatch="gmm")
        tokens = jax.random.normal(jax.random.PRNGKey(0), (48, 8))
        ctx = jnp.zeros(48, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)

        def loss(params):
            out, aux = ffn.apply({"params": params}, tokens, ctx)
            return (out**2).mean() + aux["moe_aux_loss"]

        grads = jax.grad(loss)(variables["params"])
        for w in ("experts_w1", "experts_w2", "experts_b1", "experts_b2"):
            assert float(jnp.abs(grads[w]).sum()) > 0, w
        assert float(jnp.abs(grads["router"]["router_kernel"]).sum()) > 0


class TestSweepDispatch:
    """Dispatch-free dense expert sweep must match the dropless reference."""

    def test_sweep_matches_gmm_interpret(self):
        from multimodal_moe_tpu.models.moe import (
            moe_apply_gmm, moe_apply_sweep, route_top_k_dropless)

        t, d, h, e, k = 64, 16, 32, 4, 2
        tokens = jax.random.normal(jax.random.PRNGKey(0), (t, d))
        logits = jax.random.normal(jax.random.PRNGKey(1), (t, e))
        w1 = jax.random.normal(jax.random.PRNGKey(2), (e, d, h)) * 0.1
        b1 = jax.random.normal(jax.random.PRNGKey(3), (e, 1, h)) * 0.1
        w2 = jax.random.normal(jax.random.PRNGKey(4), (e, h, d)) * 0.1
        b2 = jax.random.normal(jax.random.PRNGKey(5), (e, 1, d)) * 0.1
        idx, gates, _, _ = route_top_k_dropless(logits, k=k)
        out_s = moe_apply_sweep(tokens, idx, gates, w1, b1, w2, b2)
        out_g = moe_apply_gmm(tokens, idx, gates, w1, b1, w2, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_g), atol=1e-5)

    def test_sweep_mode_in_ffn_and_grads(self):
        ffn = MoEFFN(num_experts=4, k=2, dispatch="sweep")
        tokens = jax.random.normal(jax.random.PRNGKey(0), (96, 16))
        ctx = jnp.zeros(96, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)
        out, aux = jax.jit(ffn.apply)(variables, tokens, ctx)
        assert out.shape == (96, 16)

        def loss(params):
            o, aux = ffn.apply({"params": params}, tokens, ctx)
            return (o**2).mean() + aux["moe_aux_loss"]

        grads = jax.grad(loss)(variables["params"])
        for w in ("experts_w1", "experts_w2"):
            assert float(jnp.abs(grads[w]).sum()) > 0
        assert float(jnp.abs(grads["router"]["router_kernel"]).sum()) > 0

    def test_auto_picks_sweep_at_large_t_small_e(self):
        ffn = MoEFFN(num_experts=4, k=2, dispatch="auto")
        t = 8192
        tokens = jax.random.normal(jax.random.PRNGKey(0), (t, 8))
        ctx = jnp.zeros(t, jnp.int32)
        variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)
        out_auto, _ = ffn.apply(variables, tokens, ctx)
        out_sweep, _ = MoEFFN(num_experts=4, k=2, dispatch="sweep").apply(
            variables, tokens, ctx
        )
        np.testing.assert_allclose(
            np.asarray(out_auto), np.asarray(out_sweep), atol=1e-5
        )
