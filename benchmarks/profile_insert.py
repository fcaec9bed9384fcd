"""Where does a steady bulk-insert batch spend its time?

Builds a graph to N rows, then times, at the steady max_batch shape:
  - insert_batch end-to-end (the production fused program)
  - search_for_initial_candidates alone (same batch, same graph)
  - search hops vs mean visits (the lock-step packing waste)

Usage: python benchmarks/profile_insert.py [N] [MAX_BATCH]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0][:1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    dims = 128
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import make_corpus
    from duckdb_lm_diskann_tpu.common.types import (
        EdgeType, MetricType, VectorType,
    )
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.core.searcher import (
        search_for_initial_candidates,
    )

    gen, rng = make_corpus(n + 4 * mb, dims)
    data = gen(n + 4 * mb)

    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=64, l_insert=128, alpha=1.2,
        l_search=100, dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT4,
    )
    cfg.validate()
    t0 = time.perf_counter()
    coord = Coordinator(cfg, initial_capacity=n + 4 * mb)
    coord.bulk_build(list(range(n)), data[:n], max_batch=mb)
    _sync(coord.arrays)
    print(f"# built n={n} in {time.perf_counter()-t0:.1f}s", flush=True)

    # steady insert batches, end-to-end — in bulk mode (padded to the
    # pinned shape) so they reuse the build's compiled program.
    coord.max_insert_batch = mb
    coord._pad_bulk = True
    t1 = time.perf_counter()
    coord.insert(list(range(n, n + 2 * mb)), data[n : n + 2 * mb])
    _sync(coord.arrays)
    dt = time.perf_counter() - t1
    print(f"insert_batch x2 ({mb}): {dt:.3f}s = "
          f"{2 * mb / dt:.0f} inserts/s steady", flush=True)

    # candidate search alone at the same shape
    q = jnp.asarray(data[n + 2 * mb : n + 3 * mb])
    entry = jnp.int32(coord.entry_slot)

    def srch(width):
        return search_for_initial_candidates(
            coord.arrays, q, entry, params=coord.params,
            l_insert=cfg.l_insert, beam_width=width, assume_all_valid=True,
        )

    for width in (1, 2):
        res = srch(width)
        _sync(res)
        t1 = time.perf_counter()
        res = srch(width)
        _sync(res)
        dt_s = time.perf_counter() - t1
        hops = int(res.hops)
        mv = float(np.asarray(res.visited_count).mean())
        print(f"insert search W={width} (B={mb}): {dt_s:.3f}s  hops={hops}  "
              f"mean_visits={mv:.1f}  util={mv * mb / (hops * width * mb):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
