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

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.solar import NUM_SOLAR_BINS


class RouterOutput(NamedTuple):
    combine: jnp.ndarray      # (T, E, C) fp32 combine weights
    dispatch: jnp.ndarray     # (T, E, C) bool dispatch mask
    aux_loss: jnp.ndarray     # scalar: balance + z-loss
    expert_load: jnp.ndarray  # (E,) fraction of tokens routed per expert


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


class ContextRouter(nn.Module):
    """Router with additive context bias over solar bins (fp32 gate)."""

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
        # fp32 gate regardless of trunk dtype (ref notes :77-87).
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
        logits = tokens.astype(jnp.float32) @ w + context_bias[context_ids]
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

    @nn.compact
    def __call__(
        self, tokens: jnp.ndarray, context_ids: jnp.ndarray
    ) -> "Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]":
        """tokens (T, d), context_ids (T,) → (T, d), aux dict."""
        d = tokens.shape[-1]
        h = int(d * self.hidden_mult)
        e = self.num_experts

        router = ContextRouter(
            num_experts=e,
            num_context_bins=self.num_context_bins,
            k=self.k,
            capacity_factor=self.capacity_factor,
            name="router",
        )
        r = router(tokens, context_ids)

        w1 = self.param(
            "experts_w1", nn.initializers.lecun_normal(), (e, d, h), jnp.float32
        )
        b1 = self.param("experts_b1", nn.initializers.zeros, (e, 1, h), jnp.float32)
        w2 = self.param(
            "experts_w2", nn.initializers.lecun_normal(), (e, h, d), jnp.float32
        )
        b2 = self.param("experts_b2", nn.initializers.zeros, (e, 1, d), jnp.float32)

        x = tokens.astype(self.dtype)
        # dispatch: (T,E,C) × (T,d) → (E,C,d); both einsums are MXU matmuls.
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
        aux = {
            "moe_aux_loss": r.aux_loss,
            "expert_load": r.expert_load,
        }
        return tokens + out.astype(tokens.dtype), aux
