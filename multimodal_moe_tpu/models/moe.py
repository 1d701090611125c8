"""Context-routed Mixture-of-Experts — the layer the reference repo was built
to host but never implemented (SURVEY.md §0: routing exists only as data
plumbing + design notes).

Design follows the reference's own notes (ref: notes/related_work.md):

* **top-k gating with additive context bias** (:64-75) — the router logit is
  ``token·W + context_embed[solar_bin]``: a learned per-bin bias nudges
  routing by illumination regime instead of hard-partitioning by it
* **ST-MoE stability** (:72-87) — router z-loss on the logsumexp, gate
  computed in fp32 even when the trunk runs bf16
* **load-balance auxiliary loss** — Switch-style ``E · Σ f_e·P_e``
* **MoMa-style grouping** (:114-124) — expert groups per context/modality are
  expressed through the context bias initialization, not hard routing

TPU-first dispatch: the classic capacity-based einsum formulation — dispatch
and combine tensors ``(T, E, C)`` turn routing into three dense einsums that
land on the MXU and shard cleanly over the mesh's ``expert`` axis
(``(E, ...)``-stacked expert weights partitioned on E; XLA inserts the
all_to_alls). No gathers, no dynamic shapes, no host sync.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.solar import NUM_SOLAR_BINS


class RouterOutput(NamedTuple):
    combine: jnp.ndarray      # (T, E, C) fp32 combine weights
    dispatch: jnp.ndarray     # (T, E, C) bool dispatch mask
    aux_loss: jnp.ndarray     # scalar: balance + z-loss
    expert_load: jnp.ndarray  # (E,) fraction of tokens routed per expert


class RouterDecision(NamedTuple):
    """Sparse routing decision: O(T·k) memory instead of the O(T·E·C)
    dispatch tensors (C grows with T, so those are quadratic in T — fine for
    small token counts, impossible at full-resolution feature maps)."""

    expert_idx: jnp.ndarray   # (T, k) int32
    gates: jnp.ndarray        # (T, k) fp32, renormalized over selected experts
    position: jnp.ndarray     # (T, k) int32 slot within the expert's queue
    valid: jnp.ndarray        # (T, k) bool — False once capacity is exceeded
    aux_loss: jnp.ndarray     # scalar
    expert_load: jnp.ndarray  # (E,)


def _top_k_mask(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """(T, E) logits → bool mask of each token's top-k experts."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return logits >= kth


def route_top_k(
    logits: jnp.ndarray,
    *,
    k: int,
    capacity: int,
    balance_coef: float = 0.01,
    z_loss_coef: float = 1e-3,
) -> RouterOutput:
    """Capacity-constrained top-k routing (pure function, fp32 inside).

    Tokens beyond an expert's capacity are dropped for that expert (their
    combine weight is zero — the residual connection carries them).
    """
    logits = logits.astype(jnp.float32)
    t, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)

    topk = _top_k_mask(logits, k)                       # (T, E)
    gates = jnp.where(topk, probs, 0.0)
    # Renormalize over the selected experts (standard top-k gating).
    gates = gates / jnp.maximum(gates.sum(-1, keepdims=True), 1e-9)

    # Position of each token in each expert's queue (tokens in order).
    position = jnp.cumsum(topk.astype(jnp.int32), axis=0) - 1   # (T, E)
    within_capacity = topk & (position < capacity)

    pos_onehot = jax.nn.one_hot(
        jnp.where(within_capacity, position, capacity), capacity + 1, dtype=jnp.float32
    )[..., :capacity]                                    # (T, E, C)
    dispatch = pos_onehot > 0
    combine = gates[..., None] * pos_onehot

    # Switch load-balance loss: E · Σ_e f_e · P_e  (f from pre-capacity top-k
    # so the gradient pushes toward balance rather than toward the clip).
    f = topk.astype(jnp.float32).mean(0) * (e / k)
    p = probs.mean(0)
    balance = (f * p).sum() * e
    # Router z-loss (ST-MoE): keeps logits small/stable in bf16 trunks.
    z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)

    aux = balance_coef * balance + z_loss_coef * z
    return RouterOutput(combine, dispatch, aux, topk.astype(jnp.float32).mean(0))


def route_top_k_sparse(
    logits: jnp.ndarray,
    *,
    k: int,
    capacity: int,
    balance_coef: float = 0.01,
    z_loss_coef: float = 1e-3,
) -> RouterDecision:
    """Capacity-constrained top-k routing, sparse representation.

    Same semantics as :func:`route_top_k` (same greedy token-order capacity
    assignment, same aux losses) but O(T·k) outputs.
    """
    logits = logits.astype(jnp.float32)
    t, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)

    topk_probs, topk_idx = jax.lax.top_k(probs, k)                 # (T, k)
    gates = topk_probs / jnp.maximum(topk_probs.sum(-1, keepdims=True), 1e-9)

    # Position within each expert's queue, in (token-major, slot-minor)
    # order — identical ordering to the dense path's cumsum over T.
    onehot = jax.nn.one_hot(topk_idx.reshape(-1), e, dtype=jnp.int32)  # (T·k, E)
    position_flat = jnp.cumsum(onehot, axis=0) - onehot
    position = jnp.take_along_axis(
        position_flat.reshape(t, k, e), topk_idx[..., None], axis=-1
    )[..., 0]                                                       # (T, k)
    valid = position < capacity

    # Same loss as the dense path: f_e = fraction of top-k selections on
    # expert e scaled by E/k; P_e = mean router prob.
    f_e = jnp.zeros(e).at[topk_idx.reshape(-1)].add(1.0) / (t * k) * e
    balance = (f_e * probs.mean(0)).sum() * e
    z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    aux = balance_coef * balance + z_loss_coef * z

    expert_load = jnp.zeros(e).at[topk_idx.reshape(-1)].add(1.0) / t
    return RouterDecision(topk_idx, gates, position, valid, aux, expert_load)


def route_top_k_dropless(
    logits: jnp.ndarray,
    *,
    k: int,
    balance_coef: float = 0.01,
    z_loss_coef: float = 1e-3,
) -> "Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]":
    """Top-k routing without capacity bookkeeping (for the dropless grouped-
    GEMM path): returns (expert_idx (T,k), gates (T,k), aux scalar, load (E,)).
    Same gate renormalization and aux losses as the capacity routers."""
    logits = logits.astype(jnp.float32)
    t, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    topk_probs, topk_idx = jax.lax.top_k(probs, k)
    gates = topk_probs / jnp.maximum(topk_probs.sum(-1, keepdims=True), 1e-9)

    f_e = jnp.zeros(e).at[topk_idx.reshape(-1)].add(1.0) / (t * k) * e
    balance = (f_e * probs.mean(0)).sum() * e
    z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    aux = balance_coef * balance + z_loss_coef * z
    expert_load = jnp.zeros(e).at[topk_idx.reshape(-1)].add(1.0) / t
    return topk_idx, gates, aux, expert_load


def moe_apply_sparse(
    tokens: jnp.ndarray,          # (T, d)
    decision: RouterDecision,
    w1: jnp.ndarray,              # (E, d, h)
    b1: jnp.ndarray,              # (E, 1, h)
    w2: jnp.ndarray,              # (E, h, d)
    b2: jnp.ndarray,              # (E, 1, d)
    *,
    capacity: int,
    activation=nn.silu,
    use_pallas_ffn: bool = False,
) -> jnp.ndarray:
    """Linear-cost dispatch: scatter tokens into (E, C, d) expert buffers,
    batched expert matmuls (or the fused Pallas FFN kernel), gather back
    with gate weighting.

    All indices are unique among valid slots, so the scatter is a plain
    ``.at[].set`` — O(T·k·d) data movement, no (T, E, C) tensor ever exists.
    """
    t, d = tokens.shape
    e = w1.shape[0]
    k = decision.expert_idx.shape[1]

    flat_expert = decision.expert_idx.reshape(-1)                   # (T·k,)
    flat_pos = decision.position.reshape(-1)
    flat_valid = decision.valid.reshape(-1)
    # Invalid (over-capacity) copies land in a trash slot at the end.
    slot = jnp.where(flat_valid, flat_expert * capacity + flat_pos, e * capacity)

    token_ids = jnp.arange(t * k) // k
    src = tokens[token_ids]                                          # (T·k, d)
    buf = jnp.zeros((e * capacity + 1, d), tokens.dtype).at[slot].set(
        jnp.where(flat_valid[:, None], src, 0)
    )

    if use_pallas_ffn:
        # Fused Pallas expert FFN: hidden activations never leave VMEM.
        from ..ops.moe_kernels import fused_expert_ffn

        flat_out = fused_expert_ffn(
            buf[: e * capacity], w1, b1, w2, b2, capacity
        )
    else:
        expert_in = buf[: e * capacity].reshape(e, capacity, d)
        mid = activation(
            jnp.einsum("ecd,edh->ech", expert_in, w1.astype(tokens.dtype))
            + b1.astype(tokens.dtype)
        )
        expert_out = (
            jnp.einsum("ech,ehd->ecd", mid, w2.astype(tokens.dtype))
            + b2.astype(tokens.dtype)
        )
        flat_out = expert_out.reshape(e * capacity, d)
    gathered = flat_out[jnp.clip(slot, 0, e * capacity - 1)]         # (T·k, d)
    weighted = gathered * (
        decision.gates.reshape(-1, 1).astype(tokens.dtype)
        * flat_valid[:, None].astype(tokens.dtype)
    )
    return weighted.reshape(t, k, d).sum(axis=1)


def moe_apply_gmm(
    tokens: jnp.ndarray,          # (T, d)
    expert_idx: jnp.ndarray,      # (T, k) int32
    gates: jnp.ndarray,           # (T, k) fp32
    w1: jnp.ndarray,              # (E, d, h)
    b1: jnp.ndarray,              # (E, 1, h)
    w2: jnp.ndarray,              # (E, h, d)
    b2: jnp.ndarray,              # (E, 1, d)
    *,
    activation=nn.silu,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dropless grouped-GEMM dispatch (megablox ``gmm``).

    Sort the T·k (token, expert) pairs by expert, run both FFN matmuls as
    grouped GEMMs over contiguous expert segments (one MXU pass each — no
    (E, C, d) buffer, no capacity drops), then unsort and combine with the
    gate weights. The megablox kernel ships its own VJP, so the whole path
    is differentiable.

    This is the high-expert-count replacement for the capacity paths
    (docs/performance.md roadmap): compute is exactly Σ_e T_e·FFN instead of
    E·C·FFN, and no token is ever dropped.
    """
    t, d = tokens.shape
    e = w1.shape[0]
    k = expert_idx.shape[1]
    dtype = tokens.dtype

    flat_expert = expert_idx.reshape(-1)                       # (T·k,)
    order = jnp.argsort(flat_expert)                           # stable
    token_ids = jnp.arange(t * k, dtype=jnp.int32) // k
    src = tokens[token_ids[order]]                             # (T·k, d) sorted
    group_sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)

    if interpret:
        # Non-TPU backends (CPU tests): same segment-matmul semantics via a
        # per-token expert-weight gather (fine at test sizes; gmm is a TPU
        # kernel).
        eid = flat_expert[order]
        mid = activation(
            jnp.einsum("td,tdh->th", src, w1[eid].astype(dtype))
            + b1[eid, 0].astype(dtype)
        )
        out_sorted = (
            jnp.einsum("th,thd->td", mid, w2[eid].astype(dtype))
            + b2[eid, 0].astype(dtype)
        )
    else:
        from jax.experimental.pallas.ops.tpu.megablox import gmm

        mid = activation(
            gmm(src, w1.astype(dtype), group_sizes, preferred_element_type=jnp.float32)
            .astype(dtype)
            + b1[flat_expert[order], 0].astype(dtype)
        )
        out_sorted = gmm(
            mid, w2.astype(dtype), group_sizes, preferred_element_type=jnp.float32
        ).astype(dtype) + b2[flat_expert[order], 0].astype(dtype)

    inv = jnp.argsort(order)
    out_flat = out_sorted[inv]                                  # (T·k, d)
    weighted = out_flat * gates.reshape(-1, 1).astype(dtype)
    return weighted.reshape(t, k, d).sum(axis=1)


def moe_apply_sweep(
    tokens: jnp.ndarray,          # (T, d)
    expert_idx: jnp.ndarray,      # (T, k)
    gates: jnp.ndarray,           # (T, k)
    w1: jnp.ndarray,              # (E, d, h)
    b1: jnp.ndarray,              # (E, 1, h)
    w2: jnp.ndarray,              # (E, h, d)
    b2: jnp.ndarray,              # (E, 1, d)
    *,
    activation=nn.silu,
) -> jnp.ndarray:
    """Dispatch-free dense expert sweep (dropless).

    Run EVERY expert over ALL tokens and combine with the (T, E) gate
    matrix. Redundant compute (factor E/k) but **zero routing machinery** —
    no sort, no scatter, no capacity buffers, just three einsums on the MXU.

    On v5e at protocol token counts this wins big for small E: the
    capacity-scatter path measures 15.4ms fwd and megablox gmm 17.3ms at
    T=110k/E=4 (both dominated by sort/scatter, the FFN math is <1ms), while
    the sweep is pure matmul time (~2-3ms). Crossover vs gmm is around
    E≈16; `dispatch="auto"` picks accordingly.
    """
    t, d = tokens.shape
    e = w1.shape[0]
    dtype = tokens.dtype

    # Under an active (data, expert) mesh, pin the expert-parallel layout
    # explicitly: E over the expert axis, T over the data axis. Tokens
    # arrive sharded over BOTH axes (full-DP batches), which conflicts with
    # the expert-sharded weights — without the constraint GSPMD resolves the
    # (E, T, h) mid tensor by replicate-then-reshard ("involuntary full
    # rematerialization") instead of the cheap token all-gather over the
    # expert axis. No-op single-chip.
    from ..parallel.mesh import DATA_AXIS, EXPERT_AXIS, constrain

    mid = activation(
        jnp.einsum("td,edh->eth", tokens, w1.astype(dtype)) + b1.astype(dtype)
    )
    mid = constrain(mid, EXPERT_AXIS, DATA_AXIS, None)
    out_e = jnp.einsum("eth,ehd->etd", mid, w2.astype(dtype)) + b2.astype(dtype)
    out_e = constrain(out_e, EXPERT_AXIS, DATA_AXIS, None)

    comb = (
        jnp.zeros((t, e), jnp.float32)
        .at[jnp.arange(t)[:, None], expert_idx]
        .add(gates.astype(jnp.float32))
    )
    # Combine as an elementwise gate-mask + reduce over e, NOT
    # einsum("etd,te->td"): the einsum's contraction makes GSPMD transpose
    # the (e, t, d) intermediate across the mesh ("involuntary full
    # rematerialization" under expert sharding); the reduce form keeps
    # every operand in its natural sharding and lowers the e-sum to one
    # clean psum over the expert axis.
    return (out_e * comb.T.astype(dtype)[:, :, None]).sum(axis=0)


def moe_apply_sweep_int8(
    tokens_q: jnp.ndarray,        # (T, d) int8 codes
    token_scale: jnp.ndarray,     # () fp32 — trunk requant scale of the codes
    expert_idx: jnp.ndarray,      # (T, k)
    gates: jnp.ndarray,           # (T, k)
    w1_q: jnp.ndarray,            # (E, d, h) int8
    s_w1: jnp.ndarray,            # (E, h) fp32 per-expert-per-channel
    b1: jnp.ndarray,              # (E, 1, h) fp32
    s_mid: jnp.ndarray,           # (E,) fp32 calibrated mid-activation scales
    w2_q: jnp.ndarray,            # (E, h, d) int8
    s_w2: jnp.ndarray,            # (E, d) fp32
    b2: jnp.ndarray,              # (E, 1, d) fp32
) -> jnp.ndarray:
    """w8a8 expert sweep (PTQ serving twin of :func:`moe_apply_sweep`).

    Both grouped einsums run s8×s8→s32 on the MXU (2× the bf16 rate on
    v5e) and the (E, T, h) mid tensor materializes as 1 byte/elem — the
    sweep's E-fold redundancy makes byte- and FLOP-halving count double
    here. The silu epilogue dequantizes with the fused (token·weight)
    scale and requantizes per expert on calibrated statics; the combine
    and output stay fp32.
    """
    t, d = tokens_q.shape
    e = w1_q.shape[0]
    from ..parallel.mesh import DATA_AXIS, EXPERT_AXIS, constrain

    x32 = jnp.einsum(
        "td,edh->eth", tokens_q, w1_q, preferred_element_type=jnp.int32
    )
    x32 = constrain(x32, EXPERT_AXIS, DATA_AXIS, None)
    # Mid epilogue goes through the shared switchable path (bf16 default —
    # the round-4 epilogue study in docs/performance.md).
    from .layers import apply_i8_epilogue

    mid_q = apply_i8_epilogue(
        x32, token_scale * s_w1[:, None, :], b1, True, s_mid[:, None, None]
    )
    y32 = jnp.einsum(
        "eth,ehd->etd", mid_q, w2_q, preferred_element_type=jnp.int32
    )
    out_e = y32.astype(jnp.float32) * (s_mid[:, None, None] * s_w2[:, None, :]) + b2
    out_e = constrain(out_e, EXPERT_AXIS, DATA_AXIS, None)

    comb = (
        jnp.zeros((t, e), jnp.float32)
        .at[jnp.arange(t)[:, None], expert_idx]
        .add(gates.astype(jnp.float32))
    )
    return (out_e * comb.T[:, :, None]).sum(axis=0)


def resolve_dispatch(dispatch: str, num_tokens: int, num_experts: int) -> str:
    """Resolve ``dispatch="auto"`` to the concrete mode MoEFFN will run.

    Exposed so run metadata can record the *effective* dispatch (the auto
    thresholds are measured crossovers and may move between versions —
    checkpoint evals must not compare numerics across silently different
    modes; see docs/performance.md round-2 table)."""
    if dispatch != "auto":
        return dispatch
    if num_tokens <= MoEFFN._DENSE_TOKEN_LIMIT:
        return "dense"
    if num_experts <= MoEFFN._SWEEP_EXPERT_LIMIT:
        return "sweep"
    return "sparse"


class ContextGate(nn.Module):
    """The gate itself: token·W + context_embed[bin] in fp32 (ref notes :77-87)."""

    num_experts: int
    num_context_bins: int = NUM_SOLAR_BINS

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, context_ids: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "router_kernel",
            nn.initializers.truncated_normal(0.02),
            (tokens.shape[-1], self.num_experts),
            jnp.float32,
        )
        context_bias = self.param(
            "context_bias",
            nn.initializers.zeros,
            (self.num_context_bins, self.num_experts),
            jnp.float32,
        )
        return tokens.astype(jnp.float32) @ w + context_bias[context_ids]


class ContextRouter(nn.Module):
    """Router with additive context bias over solar bins (fp32 gate),
    dense (T, E, C) output representation."""

    num_experts: int
    num_context_bins: int = NUM_SOLAR_BINS
    k: int = 2
    capacity_factor: float = 1.25
    balance_coef: float = 0.01
    z_loss_coef: float = 1e-3

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, context_ids: jnp.ndarray) -> RouterOutput:
        """tokens (T, d) fp-any; context_ids (T,) int32 → RouterOutput."""
        t = tokens.shape[0]
        logits = ContextGate(
            self.num_experts, self.num_context_bins, name="gate"
        )(tokens, context_ids)
        capacity = max(int(t * self.k * self.capacity_factor / self.num_experts), self.k)
        return route_top_k(
            logits,
            k=self.k,
            capacity=capacity,
            balance_coef=self.balance_coef,
            z_loss_coef=self.z_loss_coef,
        )


class MoEFFN(nn.Module):
    """Expert FFNs with capacity-based einsum dispatch.

    Expert weights are stacked ``(E, ...)`` — the mesh's ``expert`` axis
    shards them, turning the dispatch einsums into all_to_alls on ICI.
    The residual path carries capacity-dropped tokens.
    """

    num_experts: int = 4
    hidden_mult: float = 2.0
    k: int = 2
    capacity_factor: float = 1.25
    num_context_bins: int = NUM_SOLAR_BINS
    dtype: Any = jnp.float32
    # "dense": (T,E,C) einsum dispatch — fastest for small T (pure matmuls)
    #          but O(T²) compute/memory since C grows with T.
    # "sparse": capacity sort/scatter dispatch — O(T·k·d); over-capacity
    #           tokens drop. Measured 15.4ms fwd at T=110k/E=4 on v5e —
    #           scatter-bound, not FLOP-bound.
    # "sweep": dispatch-free dense expert sweep (dropless) — every expert
    #          over all tokens, gate-matrix combine. E/k redundant FLOPs but
    #          pure MXU; the fastest large-T path for small E, and shards
    #          naturally (tokens on data axis, experts on expert axis, one
    #          psum over E for the combine).
    # "gmm":   dropless megablox grouped-GEMM — expert-sorted tokens, two
    #          grouped MXU passes. EXPERIMENTAL/opt-in: the round-3 sweep
    #          over (d, E) ∈ {128,256}×{32,64} at T=55k fwd+bwd found one
    #          winning corner only — d=128, E=64: 22.4 ms vs sparse 23.5
    #          (a 5% edge); at d=256 it loses ~35% to sparse (39.8 vs
    #          29.2). Kept for parity/tests; auto never selects it.
    # "auto":  dense below _DENSE_TOKEN_LIMIT tokens; above it, sweep for
    #          E ≤ _SWEEP_EXPERT_LIMIT else sparse.
    dispatch: str = "auto"
    # Fused Pallas expert FFN on the sparse path (rounds capacity up to the
    # kernel tile; requires d and hidden to be 128-lane friendly).
    use_pallas_ffn: bool = False

    _DENSE_TOKEN_LIMIT = 4096
    # Measured on v5e (T=109,824, D=128, fwd+bwd): sweep 12.8/13.4/14.0 ms
    # at E=4/8/16 vs sparse 18.9/18.6/20.6 and gmm 21.3/21.0/22.0 — the
    # sweep is bandwidth- not FLOP-dominated at detector widths, so it
    # wins well past the naive FLOP crossover.
    _SWEEP_EXPERT_LIMIT = 16

    @nn.compact
    def __call__(
        self, tokens, context_ids: jnp.ndarray
    ) -> "Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]":
        """tokens (T, d) — fp array, or a :class:`quant.QT` of int8 codes
        for the w8a8 serving branch — context_ids (T,) → (T, d), aux dict.
        The int8 branch always runs the dropless sweep (the mode serving
        resolves to at protocol token counts) and returns fp32 tokens."""
        from ..quant import QT

        quant = isinstance(tokens, QT)
        tokens_fp = (
            tokens.q.astype(jnp.float32) * tokens.s if quant else tokens
        )
        t, d = tokens_fp.shape
        h = int(d * self.hidden_mult)
        e = self.num_experts
        capacity = max(int(t * self.k * self.capacity_factor / e), self.k)

        logits = ContextGate(e, self.num_context_bins, name="router")(
            tokens_fp, context_ids
        )

        w1 = self.param(
            "experts_w1", nn.initializers.lecun_normal(), (e, d, h), jnp.float32
        )
        b1 = self.param("experts_b1", nn.initializers.zeros, (e, 1, h), jnp.float32)
        w2 = self.param(
            "experts_w2", nn.initializers.lecun_normal(), (e, h, d), jnp.float32
        )
        b2 = self.param("experts_b2", nn.initializers.zeros, (e, 1, d), jnp.float32)

        if not quant and not self.is_initializing():
            # PTQ calibration statistic: per-expert absmax of the sweep's mid
            # activation over ALL tokens (a dropless upper bound, valid for
            # every dispatch mode). Stored only under mutable=['qcal'];
            # dead code XLA removes otherwise — see quant.py.
            from ..quant import absmax_sow_kwargs

            mid_cal = nn.silu(jnp.einsum("td,edh->eth", tokens_fp, w1) + b1)
            self.sow(
                "qcal", "mid_absmax",
                jnp.max(jnp.abs(mid_cal), axis=(1, 2)).astype(jnp.float32),
                **absmax_sow_kwargs(),
            )

        if quant:
            # w8a8 serving: per-expert-per-channel int8 weights + calibrated
            # static scales (built offline by quant.build_quant_variables;
            # the fp32 router above keeps reading 'params').
            w1_q = self.variable(
                "quant", "w1_q", lambda: jnp.zeros((e, d, h), jnp.int8)
            )
            s_w1 = self.variable(
                "quant", "s_w1", lambda: jnp.ones((e, h), jnp.float32)
            )
            b1_v = self.variable(
                "quant", "b1", lambda: jnp.zeros((e, 1, h), jnp.float32)
            )
            s_mid = self.variable(
                "quant", "s_mid", lambda: jnp.ones((e,), jnp.float32)
            )
            w2_q = self.variable(
                "quant", "w2_q", lambda: jnp.zeros((e, h, d), jnp.int8)
            )
            s_w2 = self.variable(
                "quant", "s_w2", lambda: jnp.ones((e, d), jnp.float32)
            )
            b2_v = self.variable(
                "quant", "b2", lambda: jnp.zeros((e, 1, d), jnp.float32)
            )
            topk_idx, gates, aux_loss, expert_load = route_top_k_dropless(
                logits, k=self.k
            )
            out = moe_apply_sweep_int8(
                tokens.q, tokens.s, topk_idx, gates,
                w1_q.value, s_w1.value, b1_v.value, s_mid.value,
                w2_q.value, s_w2.value, b2_v.value,
            )
            aux = {"moe_aux_loss": aux_loss, "expert_load": expert_load}
            return tokens_fp + out, aux

        mode = resolve_dispatch(self.dispatch, t, e)

        x = tokens.astype(self.dtype)
        if mode in ("gmm", "sweep"):
            topk_idx, gates, aux_loss, expert_load = route_top_k_dropless(
                logits, k=self.k
            )
            if mode == "sweep":
                out = moe_apply_sweep(x, topk_idx, gates, w1, b1, w2, b2)
            else:
                out = moe_apply_gmm(
                    x, topk_idx, gates, w1, b1, w2, b2,
                    interpret=jax.default_backend() != "tpu",
                )
        elif mode == "dense":
            r = route_top_k(logits, k=self.k, capacity=capacity)
            expert_in = jnp.einsum(
                "tec,td->ecd", r.dispatch.astype(self.dtype), x
            )
            mid = nn.silu(
                jnp.einsum("ecd,edh->ech", expert_in, w1.astype(self.dtype))
                + b1.astype(self.dtype)
            )
            expert_out = (
                jnp.einsum("ech,ehd->ecd", mid, w2.astype(self.dtype))
                + b2.astype(self.dtype)
            )
            out = jnp.einsum(
                "tec,ecd->td", r.combine.astype(self.dtype), expert_out
            )
            aux_loss, expert_load = r.aux_loss, r.expert_load
        else:
            if self.use_pallas_ffn:
                from ..ops.moe_kernels import round_up_capacity

                capacity = round_up_capacity(capacity)
            rd = route_top_k_sparse(logits, k=self.k, capacity=capacity)
            out = moe_apply_sparse(
                x, rd, w1, b1, w2, b2, capacity=capacity,
                use_pallas_ffn=self.use_pallas_ffn,
            )
            aux_loss, expert_load = rd.aux_loss, rd.expert_load

        aux = {
            "moe_aux_loss": aux_loss,
            "expert_load": expert_load,
        }
        return tokens + out.astype(tokens.dtype), aux
