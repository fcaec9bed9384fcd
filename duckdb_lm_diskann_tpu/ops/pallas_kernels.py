"""Pallas TPU kernels for the hot frontier-scoring ops.

The reference's per-chip workhorse is its hand-written SIMD kernel library
(ternary popcount dot: AVX-512 VPOPCNTDQ / AVX2 / NEON variants,
core/ternary_quantization.hpp:315-546, runtime dispatch :562-602). The
TPU-native equivalent here fuses the whole frontier-scoring pipeline of one
beam hop into a single kernel:

    gather the visited nodes' cached edge planes from HBM (scalar-prefetch
    driven row DMA) -> popcount dot against the pre-encoded query planes ->
    similarity (VPU)

which avoids materializing the [B, R, W] gather results in HBM between the
gather and the arithmetic (XLA keeps gathers as separate HLOs).

Dispatch mirrors the reference's GetDotKernel runtime dispatch: on TPU the
Pallas kernel runs compiled; elsewhere the jnp fallback in ops/ternary.py is
used (tests exercise the kernel in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _ternary_score_kernel(cur_ref, qp_ref, qn_ref, ep_ref, en_ref, out_ref):
    """One grid step scores all R cached neighbor codes of one query's
    current node.

    cur_ref: scalar-prefetch i32[B] (drives the HBM row gather via index_map)
    qp/qn:   u32[B, W]     whole query-plane arrays (VMEM resident, tiny)
    ep/en:   u32[1, R, W]  the gathered node's cached neighbor planes
    out:     i32[B, R]     whole output (row i written per step)
    """
    i = pl.program_id(0)
    qp = qp_ref[i, :]  # [W]
    qn = qn_ref[i, :]
    ep = ep_ref[0]  # [R, W]
    en = en_ref[0]
    pp = jax.lax.population_count(qp[None, :] & ep)
    pn = jax.lax.population_count(qp[None, :] & en)
    np_ = jax.lax.population_count(qn[None, :] & ep)
    nn = jax.lax.population_count(qn[None, :] & en)
    dot = jnp.sum(
        (pp.astype(jnp.int32) - pn.astype(jnp.int32))
        - (np_.astype(jnp.int32) - nn.astype(jnp.int32)),
        axis=-1,
    )
    out_ref[i, :] = dot


@functools.partial(jax.jit, static_argnames=("interpret",))
def ternary_frontier_scores(
    cur_slots: jnp.ndarray,  # i32[B] current node slot per query
    q_pos: jnp.ndarray,  # u32[B, W]
    q_neg: jnp.ndarray,  # u32[B, W]
    edge_pos: jnp.ndarray,  # u32[C, R, W] (HBM resident)
    edge_neg: jnp.ndarray,  # u32[C, R, W]
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather+popcount-dot: returns i32[B, R] ternary scores of every
    cached neighbor of each query's current node."""
    B, W = q_pos.shape
    _, R, _ = edge_pos.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, W), lambda i, cur: (0, 0)),
            pl.BlockSpec((B, W), lambda i, cur: (0, 0)),
            pl.BlockSpec((1, R, W), lambda i, cur: (cur[i], 0, 0)),
            pl.BlockSpec((1, R, W), lambda i, cur: (cur[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, R), lambda i, cur: (0, 0)),
    )
    return pl.pallas_call(
        _ternary_score_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.int32),
        interpret=interpret,
    )(cur_slots, q_pos, q_neg, edge_pos, edge_neg)


def ternary_frontier_scores_auto(cur_slots, q_pos, q_neg, edge_pos, edge_neg):
    """Runtime dispatch (GetDotKernel analog): compiled Pallas on TPU,
    interpreter elsewhere (tests)."""
    return ternary_frontier_scores(
        cur_slots, q_pos, q_neg, edge_pos, edge_neg, interpret=not _on_tpu()
    )
