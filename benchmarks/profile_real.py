"""Slope-profile the REAL core/searcher.beam_search (not a mirror).

benchmarks/profile_searcher.py mirrors the hop body under a fori_loop and
its component slopes sum to ~0.29 ms/hop (post assume_all_valid, INT4
planar) — yet the bench measures ~0.93 ms/batch-hop end-to-end. This
script times the actual jitted beam_search at two forced iteration counts
(max_visits caps the while loop at it*E < V) and reports

    per-hop slope   = (t(V_hi) - t(V_lo)) / (V_hi - V_lo)
    fixed intercept = t(V_lo) - slope * V_lo   (seed + re-rank + dispatch)

The re-rank sort runs over the [B, V] visited log, so V_hi/V_lo also
change the re-rank size; sorted_dedup_topk is timed standalone at both
sizes and the slope is corrected by that delta.

Methodology per benchmarks/NOTES.md round-3 corrections: hard host-pull
sync (np.asarray), never jax.block_until_ready; best-of-reps.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType
from duckdb_lm_diskann_tpu.core.graph import GraphArrays, GraphParams
from duckdb_lm_diskann_tpu.core.searcher import beam_search
from duckdb_lm_diskann_tpu.ops import topk as topk_ops
from duckdb_lm_diskann_tpu.ops.quantize import words_per_i4

B, L, R, D = 1024, 100, 64, 128
CAP = 1 << 20
V_LO, V_HI = 48, 160
REPS = 5


def main():
    t_start = time.perf_counter()
    rng = np.random.default_rng(0)
    i4w = words_per_i4(D)
    arrays = GraphArrays(
        vectors=jnp.asarray(rng.standard_normal((CAP, D)).astype(np.float32)),
        neighbors=jnp.asarray(rng.integers(0, CAP, (CAP, R), dtype=np.int32)),
        valid=jnp.asarray(np.ones(CAP, np.bool_)),
        edge_pos=jnp.zeros((CAP, 0, 0), jnp.uint32),
        edge_neg=jnp.zeros((CAP, 0, 0), jnp.uint32),
        edge_i8=jnp.zeros((CAP, 0, 0), jnp.int8),
        edge_i4=jnp.asarray(
            rng.integers(0, 1 << 32, (CAP, R, i4w), dtype=np.uint64).astype(
                np.uint32
            )
        ),
        edge_scale=jnp.asarray(rng.random((CAP, R)).astype(np.float32)),
        edge_f32=jnp.zeros((CAP, 0, 0), jnp.float32),
        dirty_rows=jnp.zeros((CAP,), jnp.bool_),
    )
    _ = np.asarray(arrays.edge_scale[:1, :1])  # fence the host->device push
    print(f"tables resident ({time.perf_counter() - t_start:.0f}s)",
          flush=True)
    params = GraphParams(
        dims=D, r=R, metric=MetricType.L2, edge_type=EdgeType.INT4,
        alpha=1.2, l_insert=128, l_search=L, max_visits=4 * L,
        pallas="0", bitonic=False,
    )
    queries = [
        jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        for _ in range(4)
    ]

    def timed(fn, args_list, reps=REPS):
        _ = np.asarray(fn(args_list[0])[0][:1, :1])  # compile
        best = float("inf")
        for i in range(reps):
            a = args_list[(i + 1) % len(args_list)]
            t0 = time.perf_counter()
            _ = np.asarray(fn(a)[0][:1, :1])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    def run_at(v):
        def f(q):
            r = beam_search(
                arrays, q, jnp.int32(0), params=params, l_search=L, k=10,
                max_visits=v, assume_all_valid=True,
            )
            return (r.topk_dists, r.hops)
        return f

    # Confirm forced iteration counts (cap must bind, not convergence).
    f_lo, f_hi = run_at(V_LO), run_at(V_HI)
    hops_lo = int(np.asarray(f_lo(queries[0])[1]))
    hops_hi = int(np.asarray(f_hi(queries[0])[1]))
    print(f"hops at V={V_LO}: {hops_lo}   V={V_HI}: {hops_hi}", flush=True)

    t_lo = timed(f_lo, queries)
    t_hi = timed(f_hi, queries)

    # Standalone re-rank at both V to correct the slope for the [B, V]
    # sort-size difference.
    def rerank_at(v):
        vd = jnp.asarray(rng.random((B, v)).astype(np.float32))
        vs = jnp.asarray(rng.integers(0, CAP, (B, v), dtype=np.int32))

        @jax.jit
        def f(q):
            d, s = topk_ops.sorted_dedup_topk(
                vd + q[:, :1] * 0, vs, bitonic=False)
            return (d, s)
        return f

    r_lo = timed(rerank_at(V_LO), queries)
    r_hi = timed(rerank_at(V_HI), queries)

    dh = hops_hi - hops_lo
    raw_slope = (t_hi - t_lo) / dh
    corr_slope = (t_hi - t_lo - (r_hi - r_lo)) / dh
    fixed = t_lo - corr_slope * hops_lo
    print(f"t(V={V_LO}) = {t_lo:.2f} ms   t(V={V_HI}) = {t_hi:.2f} ms")
    print(f"rerank-only: {r_lo:.2f} ms @ {V_LO}   {r_hi:.2f} ms @ {V_HI}")
    print(f"per-hop slope: raw {raw_slope:.3f} ms  "
          f"rerank-corrected {corr_slope:.3f} ms")
    print(f"fixed (seed + rerank@{V_LO} + dispatch): {fixed:.2f} ms")


if __name__ == "__main__":
    main()
