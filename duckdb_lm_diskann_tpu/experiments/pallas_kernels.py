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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common.types import MetricType

def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dispatch_mode(force: str | None = None) -> str | None:
    """Trace-time kernel dispatch: 'compiled', 'interpret', or None (use the
    jnp fallback). Mirrors ResolveKernel/GetDotKernel runtime dispatch
    (ternary_quantization.hpp:562-602) — and like the reference's dispatch,
    "auto" picks the empirically fastest backend for the hardware.

    Measured on TPU v5e (engine-level QPS, batch 1024, exclusive chip):
    the plain-XLA jnp forms beat these per-row-grid Pallas kernels on every
    edge type — INT4 128d L2: 10.3k vs 8.7k qps; TERNARY 960d cosine: 6.8k
    vs 4.5k qps. One [1, R, ...] row DMA per grid step cannot keep enough
    fetches in flight; XLA's native gather pipelines the whole [B] batch.
    So "auto" resolves to the jnp path everywhere until a deeper-pipelined
    kernel (manual multi-row async_copy) beats it; bench.py re-measures
    both on every run (qps_pallas / qps_xla).

    ``force`` (usually GraphParams.pallas, seeded from the LMD_PALLAS env
    var): "auto" = fastest (currently jnp); "1" = fused Pallas kernels —
    compiled on TPU, interpreter elsewhere (tests exercise the kernel code
    path on CPU); "2"/"deep" = the manual K-deep DMA-pipelined kernels
    (INT4/TERNARY; other edge types fall back to the "1" kernels);
    "interpret" = always interpreter; "0" = always jnp."""
    mode = force if force is not None else os.environ.get("LMD_PALLAS", "auto")
    if mode in ("0", "auto"):
        return None
    if mode == "interpret":
        return "interpret"
    if mode in ("2", "deep"):
        return "deep" if _on_tpu() else "deep-interpret"
    if _on_tpu():
        return "compiled"
    return "interpret" if mode == "1" else None


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


def _ternary_deep_kernel(
    n_flight, cur_ref, qp_ref, qn_ref, ep_hbm, en_hbm,
    out_ref, ep_buf, en_buf, sems
):
    """Deep-pipelined ternary popcount scoring: the K-slot manual-DMA ring
    of _int4_deep_kernel applied to the two cached edge bit-planes."""
    i = pl.program_id(0)
    B = pl.num_programs(0)
    K = n_flight

    def issue(j, slot):
        pltpu.make_async_copy(
            ep_hbm.at[cur_ref[j]], ep_buf.at[slot], sems.at[slot]
        ).start()
        pltpu.make_async_copy(
            en_hbm.at[cur_ref[j]], en_buf.at[slot], sems.at[slot]
        ).start()

    @pl.when(i == 0)
    def _warmup():
        for j in range(min(K, B)):
            issue(j, j % K)

    slot = jax.lax.rem(i, K)
    pltpu.make_async_copy(
        ep_hbm.at[cur_ref[i]], ep_buf.at[slot], sems.at[slot]
    ).wait()
    pltpu.make_async_copy(
        en_hbm.at[cur_ref[i]], en_buf.at[slot], sems.at[slot]
    ).wait()

    qp = qp_ref[i, :]  # [W]
    qn = qn_ref[i, :]
    ep = ep_buf[slot]  # [R, W]
    en = en_buf[slot]
    pp = jax.lax.population_count(qp[None, :] & ep)
    pn = jax.lax.population_count(qp[None, :] & en)
    np_ = jax.lax.population_count(qn[None, :] & ep)
    nn = jax.lax.population_count(qn[None, :] & en)
    out_ref[i, :] = jnp.sum(
        (pp.astype(jnp.int32) - pn.astype(jnp.int32))
        - (np_.astype(jnp.int32) - nn.astype(jnp.int32)),
        axis=-1,
    )

    nxt = i + K

    @pl.when(nxt < B)
    def _reissue():
        issue(nxt, slot)


@functools.partial(jax.jit, static_argnames=("n_flight", "interpret"))
def ternary_frontier_scores_deep(
    cur_slots: jnp.ndarray,  # i32[B]
    q_pos: jnp.ndarray,  # u32[B, W]
    q_neg: jnp.ndarray,  # u32[B, W]
    edge_pos: jnp.ndarray,  # u32[C, R, W] (HBM resident)
    edge_neg: jnp.ndarray,  # u32[C, R, W]
    *,
    n_flight: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather+popcount-dot with a K-deep manual DMA pipeline."""
    B, W = q_pos.shape
    C, R, _ = edge_pos.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, W), lambda i, cur: (0, 0)),
            pl.BlockSpec((B, W), lambda i, cur: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, R), lambda i, cur: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_flight, R, W), jnp.uint32),
            pltpu.VMEM((n_flight, R, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_flight,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_ternary_deep_kernel, n_flight),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.int32),
        interpret=interpret,
    )(cur_slots, q_pos, q_neg, edge_pos, edge_neg)


# ---------------------------------------------------------------------------
# Fused gather + dequantize + distance for INT4/INT8 edge caches — the
# default (benchmarked) L2 configuration. The XLA fallback materializes the
# gathered codes and the dequantized [B, R, D] float tensor in HBM between
# ops; this kernel streams each visited node's cached codes through VMEM
# once: row DMA -> dequant -> distance (VPU), out [1, R] per grid step.
#
# INT4 codes arrive in the planar u32 device layout (nibble slot s of word
# w = dim s*DW + w, ops/quantize.words_per_i4): distances decompose as a sum
# over the 8 dim chunks, so the kernel never materializes an interleaved
# [R, D] layout (TPU reshapes across the lane dim are the one thing Pallas
# punishes). The query arrives pre-chunked as [B, 8, DW] by the wrapper.
# ---------------------------------------------------------------------------


def _metric_distance(metric, q_parts, v_parts):
    """Distance of one query against R vectors, both given as lists of
    dimension-partitioned pieces (q: [Dp], v: [R, Dp]) that together cover
    all D dims. Direct-difference forms — pairwise_distance semantics
    (ops/distance.py; ComputeExactDistanceFloat, distance.hpp:50-105) — so
    L2 keeps the cancellation-free (q-v)^2 formulation of the jnp path."""
    if metric is MetricType.L2:
        d_sq = sum(
            jnp.sum((q[None, :] - v) ** 2, axis=-1)
            for q, v in zip(q_parts, v_parts)
        )
        return jnp.sqrt(jnp.maximum(d_sq, 0.0))
    dot = sum(
        jnp.sum(q[None, :] * v, axis=-1) for q, v in zip(q_parts, v_parts)
    )
    if metric is MetricType.IP:
        return -dot
    if metric is MetricType.COSINE:
        q_sq = sum(jnp.sum(q * q) for q in q_parts)
        v_sq = sum(jnp.sum(v * v, axis=-1) for v in v_parts)
        norm = jnp.sqrt(q_sq) * jnp.sqrt(v_sq)
        cos = jnp.clip(dot / jnp.where(norm > 0.0, norm, 1.0), -1.0, 1.0)
        return jnp.where((q_sq <= 0.0) | (v_sq <= 0.0), 1.0, 1.0 - cos)
    raise ValueError(f"Unsupported metric type {metric}")


def _unpack_planar_parts(words_i32, scale):
    """Planar u32 words [R, DW] + scales [R] -> 8 dequantized chunk views
    f32[R, DW] (chunk s = dims [s*DW, (s+1)*DW))."""
    return [
        ((((words_i32 >> (4 * s)) & 0xF) ^ 8) - 8).astype(jnp.float32)
        * scale[:, None]
        for s in range(8)
    ]


def _int4_score_kernel(metric, cur_ref, q_ref, codes_ref, scale_ref, out_ref):
    """One grid step: distances from one query to all R cached INT4 neighbor
    codes of its current node.

    TPU block rules (last two block dims divisible by (8, 128) or equal to
    the array dims) make per-row 2D blocks illegal, so the queries and the
    output stay whole-array VMEM blocks indexed by program_id — the same
    pattern as the ternary kernel above; only the codes/scales are per-step
    row DMAs driven by the scalar-prefetched slots.

    q:      f32[B, 8, DW]  dim-chunked queries (chunk s = dims s*DW..)
    codes:  u32[1, R, DW]  planar nibble words (ops/quantize.words_per_i4)
    scale:  f32[1, 1, R]
    out:    f32[B, R]      (row i written per step)
    """
    i = pl.program_id(0)
    q = q_ref[i]  # [8, DW]
    c = codes_ref[0].astype(jnp.int32)  # [R, DW]
    s = scale_ref[0, 0, :]  # [R]
    v_parts = _unpack_planar_parts(c, s)
    q_parts = [q[sl, :] for sl in range(8)]
    out_ref[i, :] = _metric_distance(metric, q_parts, v_parts)


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def int4_frontier_scores(
    cur_slots: jnp.ndarray,  # i32[B]
    queries: jnp.ndarray,  # f32[B, D], D even
    edge_i4: jnp.ndarray,  # u8[C, R, D//2] (HBM resident)
    edge_scale: jnp.ndarray,  # f32[C, R]
    *,
    metric: MetricType,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather+dequant+distance: f32[B, R] approximate distances of every
    cached INT4 neighbor of each query's current node."""
    B, D = queries.shape
    C, R, DW = edge_i4.shape
    if D > 8 * DW:
        raise ValueError("edge_i4 words do not cover the query dims")
    q = jnp.pad(queries, ((0, 0), (0, 8 * DW - D))).reshape(B, 8, DW)
    scale3 = edge_scale.reshape(C, 1, R)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 8, DW), lambda i, cur: (0, 0, 0)),
            pl.BlockSpec((1, R, DW), lambda i, cur: (cur[i], 0, 0)),
            pl.BlockSpec((1, 1, R), lambda i, cur: (cur[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, R), lambda i, cur: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_int4_score_kernel, metric),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.float32),
        interpret=interpret,
    )(cur_slots, q, edge_i4, scale3)


def _int4_deep_kernel(
    metric, n_flight, cur_ref, q_ref, codes_hbm, scale_hbm,
    out_ref, codes_buf, scale_buf, sems
):
    """Deep-pipelined variant of the INT4 kernel: K manual HBM->VMEM row
    DMAs in flight instead of the BlockSpec pipeline's double buffering.

    Row gathers are latency-bound (~1 us/row issued back-to-back), so two
    buffered fetches leave the DMA engine mostly idle; a K-slot ring of
    async copies keeps K rows in flight and amortizes the latency — the
    reason the auto-pipelined kernels above lose to XLA's native gather
    (dispatch_mode docstring). Step i waits its slot's two copies (codes +
    scales, issued K steps earlier or in the step-0 warmup), scores one
    query's R neighbors, and reissues the slot for step i+K.
    """
    i = pl.program_id(0)
    B = pl.num_programs(0)
    K = n_flight

    def issue(j, slot):
        pltpu.make_async_copy(
            codes_hbm.at[cur_ref[j]], codes_buf.at[slot], sems.at[slot]
        ).start()
        pltpu.make_async_copy(
            scale_hbm.at[cur_ref[j]], scale_buf.at[slot], sems.at[slot]
        ).start()

    @pl.when(i == 0)
    def _warmup():
        for j in range(min(K, B)):
            issue(j, j % K)

    slot = jax.lax.rem(i, K)
    pltpu.make_async_copy(
        codes_hbm.at[cur_ref[i]], codes_buf.at[slot], sems.at[slot]
    ).wait()
    pltpu.make_async_copy(
        scale_hbm.at[cur_ref[i]], scale_buf.at[slot], sems.at[slot]
    ).wait()

    q = q_ref[i]  # [8, DW]
    c = codes_buf[slot].astype(jnp.int32)  # [R, DW]
    s = scale_buf[slot][0, :]  # [R]
    v_parts = _unpack_planar_parts(c, s)
    q_parts = [q[sl, :] for sl in range(8)]
    out_ref[i, :] = _metric_distance(metric, q_parts, v_parts)

    nxt = i + K

    @pl.when(nxt < B)
    def _reissue():
        issue(nxt, slot)


@functools.partial(
    jax.jit, static_argnames=("metric", "n_flight", "interpret")
)
def int4_frontier_scores_deep(
    cur_slots: jnp.ndarray,  # i32[B]
    queries: jnp.ndarray,  # f32[B, D], D even
    edge_i4: jnp.ndarray,  # u8[C, R, D//2] (HBM resident)
    edge_scale: jnp.ndarray,  # f32[C, R]
    *,
    metric: MetricType,
    n_flight: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather+dequant+distance with a K-deep manual DMA pipeline."""
    B, D = queries.shape
    C, R, DW = edge_i4.shape
    if D > 8 * DW:
        raise ValueError("edge_i4 words do not cover the query dims")
    q = jnp.pad(queries, ((0, 0), (0, 8 * DW - D))).reshape(B, 8, DW)
    scale3 = edge_scale.reshape(C, 1, R)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 8, DW), lambda i, cur: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # codes stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # scales stay in HBM
        ],
        out_specs=pl.BlockSpec((B, R), lambda i, cur: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_flight, R, DW), jnp.uint32),
            pltpu.VMEM((n_flight, 1, R), jnp.float32),
            pltpu.SemaphoreType.DMA((n_flight,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_int4_deep_kernel, metric, n_flight),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.float32),
        interpret=interpret,
    )(cur_slots, q, edge_i4, scale3)


def _int8_score_kernel(metric, cur_ref, q_ref, codes_ref, scale_ref, out_ref):
    """One grid step: distances from one query to all R cached INT8 neighbor
    codes of its current node (same whole-array query/out blocks as the
    INT4 kernel; see its docstring for the TPU block-shape rationale)."""
    i = pl.program_id(0)
    q = q_ref[i, :]  # [D]
    c = codes_ref[0].astype(jnp.float32)  # [R, D]
    s = scale_ref[0, 0, :]  # [R]
    v = c * s[:, None]
    out_ref[i, :] = _metric_distance(metric, [q], [v])


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def int8_frontier_scores(
    cur_slots: jnp.ndarray,  # i32[B]
    queries: jnp.ndarray,  # f32[B, D]
    edge_i8: jnp.ndarray,  # i8[C, R, D] (HBM resident)
    edge_scale: jnp.ndarray,  # f32[C, R]
    *,
    metric: MetricType,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather+dequant+distance for INT8 edge caches: f32[B, R]."""
    B, D = queries.shape
    C, R, _ = edge_i8.shape
    scale3 = edge_scale.reshape(C, 1, R)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i, cur: (0, 0)),
            pl.BlockSpec((1, R, D), lambda i, cur: (cur[i], 0, 0)),
            pl.BlockSpec((1, 1, R), lambda i, cur: (cur[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, R), lambda i, cur: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_int8_score_kernel, metric),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.float32),
        interpret=interpret,
    )(cur_slots, queries, edge_i8, scale3)
