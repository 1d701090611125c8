"""Pallas fused expert-FFN kernel for the MoE layer.

After dispatch, expert inputs live in a capacity buffer ``(E·C, d)`` (expert
e owns rows ``[e·C, (e+1)·C)``). The XLA path computes the expert FFN as two
batched einsums with the hidden activations ``(E, C, h)`` round-tripping
HBM. This kernel fuses ``silu(x·W1+b1)·W2+b2`` into ONE pass: each grid
program owns a token tile, streams the owning expert's weights into VMEM
(BlockSpec index maps — the tile→expert mapping is static because C is a
multiple of the tile), and the hidden tile never leaves VMEM.

Training support: ``fused_expert_ffn`` carries a custom VJP whose backward
recomputes the hidden activations with plain XLA einsums — the forward gets
the fused-kernel memory win, the backward stays autodiff-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # token rows per program; capacity is rounded up to a multiple


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """x (TILE, d); w1 (1, d, h); b1 (1, 1, h); w2 (1, h, d); b2 (1, 1, d)."""
    x = x_ref[:]
    hidden = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    hidden = jax.nn.silu(hidden + b1_ref[0])
    out = jnp.dot(
        hidden.astype(x.dtype), w2_ref[0], preferred_element_type=jnp.float32
    )
    out_ref[:] = (out + b2_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def _ffn_pallas(buf, w1, b1, w2, b2, *, capacity: int, interpret: bool = False):
    """buf (E·C, d) → (E·C, d); C must be a multiple of TILE."""
    ec, d = buf.shape
    e, _, h = w1.shape
    assert capacity % TILE == 0 and ec == e * capacity
    n_tiles = ec // TILE
    tiles_per_expert = capacity // TILE

    return pl.pallas_call(
        _ffn_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, d, h), lambda i: (i // tiles_per_expert, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, h), lambda i: (i // tiles_per_expert, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, d), lambda i: (i // tiles_per_expert, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, d), lambda i: (i // tiles_per_expert, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ec, d), buf.dtype),
        interpret=interpret,
    )(buf, w1, b1.reshape(e, 1, h), w2, b2.reshape(e, 1, d))


def _ffn_xla(buf, w1, b1, w2, b2, *, capacity: int):
    e = w1.shape[0]
    x = buf.reshape(e, capacity, -1)
    mid = jax.nn.silu(
        jnp.einsum("ecd,edh->ech", x, w1.astype(x.dtype)) + b1.astype(x.dtype)
    )
    out = jnp.einsum("ech,ehd->ecd", mid, w2.astype(x.dtype)) + b2.astype(x.dtype)
    return out.reshape(e * capacity, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_expert_ffn(buf, w1, b1, w2, b2, capacity: int, interpret: bool = False):
    """Fused expert FFN over the capacity buffer (Pallas forward, XLA VJP).

    Args: buf (E·C, d); w1 (E, d, h); b1 (E, 1, h); w2 (E, h, d); b2 (E, 1, d).
    """
    return _ffn_pallas(buf, w1, b1, w2, b2, capacity=capacity, interpret=interpret)


def _ffn_fwd(buf, w1, b1, w2, b2, capacity, interpret):
    out = _ffn_pallas(buf, w1, b1, w2, b2, capacity=capacity, interpret=interpret)
    return out, (buf, w1, b1, w2, b2)


def _ffn_bwd(capacity, interpret, residuals, g):
    buf, w1, b1, w2, b2 = residuals
    # Exact backward via XLA (recomputes the hidden activations).
    _, vjp = jax.vjp(
        lambda b, a1, c1, a2, c2: _ffn_xla(b, a1, c1, a2, c2, capacity=capacity),
        buf, w1, b1, w2, b2,
    )
    return vjp(g)


fused_expert_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def round_up_capacity(capacity: int) -> int:
    """Round a routing capacity up to the kernel tile size."""
    return -(-capacity // TILE) * TILE
