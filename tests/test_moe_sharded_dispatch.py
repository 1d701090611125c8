"""Production MoE dispatch modes under expert sharding (VERDICT r2 #4).

The round-2 multichip gate and sharded train-step test only ever ran the
*dense* path (toy token counts below ``_DENSE_TOKEN_LIMIT``); the dispatch
modes production actually uses at protocol resolution — ``sweep`` (the
94 ms/step headline path), ``sparse``, and ``gmm`` — had never executed
with expert-sharded weights. These tests run each mode on the 8-virtual-
device (4 data × 2 expert) mesh at T > 4096 and assert:

* outputs match the unsharded single-device reference,
* gradients reach every expert shard (all finite, matching unsharded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_moe_tpu.models.moe import MoEFFN, resolve_dispatch
from multimodal_moe_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    shard_params,
)

T, D, E, K = 8192, 64, 4, 2  # T > _DENSE_TOKEN_LIMIT=4096: the production regime


def _problem(dispatch: str):
    ffn = MoEFFN(num_experts=E, k=K, dispatch=dispatch)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    ctx = jnp.asarray(rng.integers(0, 6, T).astype(np.int32))
    variables = ffn.init(jax.random.PRNGKey(0), tokens, ctx)
    return ffn, variables, tokens, ctx


def _loss_fn(ffn):
    def loss(variables, tokens, ctx):
        out, aux = ffn.apply(variables, tokens, ctx)
        return jnp.sum(out**2) / T + aux["moe_aux_loss"]

    return loss


def test_auto_resolves_to_sweep_above_dense_limit():
    assert resolve_dispatch("auto", T, E) == "sweep"
    assert resolve_dispatch("auto", 4096, E) == "dense"
    assert resolve_dispatch("auto", T, 32) == "sparse"
    assert resolve_dispatch("sweep", 10, 99) == "sweep"


@pytest.mark.parametrize("dispatch", ["sweep", "sparse", "gmm"])
def test_forward_parity_expert_sharded(dispatch):
    ffn, variables, tokens, ctx = _problem(dispatch)
    ref_out, ref_aux = ffn.apply(variables, tokens, ctx)

    mesh = create_mesh(num_expert=2)  # (4 data × 2 expert)
    sh_vars = {"params": shard_params(variables["params"], mesh)}
    tok_sh = jax.device_put(tokens, batch_sharding(mesh))
    ctx_sh = jax.device_put(ctx, batch_sharding(mesh))

    out, aux = jax.jit(ffn.apply)(sh_vars, tok_sh, ctx_sh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        float(aux["moe_aux_loss"]), float(ref_aux["moe_aux_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux["expert_load"]), np.asarray(ref_aux["expert_load"]), rtol=1e-4
    )


@pytest.mark.parametrize("dispatch", ["sweep", "sparse", "gmm"])
def test_grads_reach_all_expert_shards(dispatch):
    ffn, variables, tokens, ctx = _problem(dispatch)
    loss = _loss_fn(ffn)
    ref_grads = jax.grad(loss)(variables, tokens, ctx)

    mesh = create_mesh(num_expert=2)
    sh_vars = {"params": shard_params(variables["params"], mesh)}
    tok_sh = jax.device_put(tokens, batch_sharding(mesh))
    ctx_sh = jax.device_put(ctx, batch_sharding(mesh))
    grads = jax.jit(jax.grad(loss))(sh_vars, tok_sh, ctx_sh)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat = dict(jax.tree_util.tree_leaves_with_path(grads))
    # keystr alignment: same tree structure
    flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(grads)}
    for path, ref_leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        got = np.asarray(flat[key])
        assert np.isfinite(got).all(), f"non-finite grad at {key}"
        np.testing.assert_allclose(
            got, np.asarray(ref_leaf), rtol=5e-4, atol=5e-4, err_msg=key
        )
        if "experts" in key:
            # every expert shard received gradient signal
            per_expert = np.abs(got).reshape(E, -1).sum(axis=1)
            assert (per_expert > 0).all(), f"dead expert grads at {key}: {per_expert}"


def test_sweep_sharded_in_train_step_token_regime():
    """The exact (T, E) regime the MoE-YOLO protocol step runs at P5
    (B16 → 13,728 tokens) executes sharded with finite outputs."""
    t = 16 * 22 * 39
    ffn = MoEFFN(num_experts=E, k=K, dispatch="auto")
    assert resolve_dispatch("auto", t, E) == "sweep"
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.normal(size=(t, 128)).astype(np.float32))
    ctx = jnp.asarray(rng.integers(0, 6, t).astype(np.int32))
    variables = ffn.init(jax.random.PRNGKey(1), tokens, ctx)

    mesh = create_mesh(num_expert=2)
    sh_vars = {"params": shard_params(variables["params"], mesh)}
    # Uneven T vs the 8-device batch axis: shard over data only when it
    # divides, else replicate (protocol batch dims always divide).
    tok_sh = jax.device_put(tokens, batch_sharding(mesh)) if t % 8 == 0 else tokens
    out, aux = jax.jit(ffn.apply)(sh_vars, tok_sh, ctx)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(float(aux["moe_aux_loss"]))
