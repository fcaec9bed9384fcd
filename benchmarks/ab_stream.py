"""A/B: streaming lane-refill search vs lock-step pipelined batches.

Measures, at a given corpus (manifold or HARD) and scale:
  - beam_search_many (the round-4 serving path): NB lock-step batches of B
    scanned in one dispatch; hops per batch = slowest query's visits.
  - beam_search_stream at several lane counts: converged lanes refill from
    the device-side queue, so hops ~= ceil(total_visits / lanes).

Reports QPS, total hops, lane utilization (visits / (lanes * hops)) and
verifies the two paths return identical ids.

Usage: python benchmarks/ab_stream.py [N] [corpus] [extra-lane-counts]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0][:1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    corpus = sys.argv[2] if len(sys.argv) > 2 else "manifold"
    dims, k, nq, L = 128, 10, 4096, 100
    import jax.numpy as jnp

    from duckdb_lm_diskann_tpu.common.types import (
        EdgeType, MetricType, VectorType,
    )
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.core.searcher import (
        beam_search_many, beam_search_stream,
    )

    if corpus == "hard":
        from duckdb_lm_diskann_tpu.utils.corpora import make_hard_corpus

        gen, rng = make_hard_corpus(n, dims, 0x4A2D)
    else:
        sys.path.insert(0, ".")
        from bench import make_corpus

        gen, rng = make_corpus(n, dims)
    data = gen(n)
    qidx = rng.integers(0, n, nq)
    queries = data[qidx] + 0.01 * rng.standard_normal((nq, dims)).astype(
        np.float32
    )

    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=64, l_insert=128, alpha=1.2,
        l_search=L, dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT4,
    )
    cfg.validate()
    t0 = time.perf_counter()
    coord = Coordinator(cfg, initial_capacity=n)
    coord.bulk_build(list(range(n)), data, max_batch=2048)
    print(f"# built n={n} ({corpus}) in {time.perf_counter()-t0:.1f}s",
          flush=True)

    q_dev = jnp.asarray(queries)
    entry = jnp.int32(coord.entry_slot)

    def timed(fn, reps=3):
        res = fn()
        _sync(res)
        best = 1e30
        for _ in range(reps):
            t1 = time.perf_counter()
            out = fn()
            _sync(out)
            best = min(best, time.perf_counter() - t1)
        return best, res

    # lock-step pipelined path
    B = 1024
    nb = nq // B
    qs = q_dev.reshape(nb, B, dims)
    t_many, res_m = timed(lambda: beam_search_many(
        coord.arrays, qs, entry, params=coord.params, l_search=L, k=k,
        assume_all_valid=True,
    ))
    hops_m = int(np.asarray(res_m.hops).sum())
    visits = int(np.asarray(res_m.visited_count).sum())
    ids_m = np.asarray(res_m.topk_slots).reshape(-1, k)
    print(f"many   B={B}: {nq/t_many:9.1f} qps  hops={hops_m}  "
          f"visits/q={visits/nq:.1f}  util={visits/(hops_m*B):.3f}",
          flush=True)

    extra = (
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else []
    )
    for lanes in [512, 1024, 2048] + extra:
        t_s, res_s = timed(lambda lanes=lanes: beam_search_stream(
            coord.arrays, q_dev, entry, params=coord.params, l_search=L,
            k=k, lanes=lanes, assume_all_valid=True,
        ))
        hops_s = int(res_s.hops)
        ids_s = np.asarray(res_s.topk_slots)
        match = (ids_s == ids_m).mean()
        print(f"stream lanes={lanes:5d}: {nq/t_s:9.1f} qps  hops={hops_s}  "
              f"util={visits/(hops_s*lanes):.3f}  id-match={match:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
