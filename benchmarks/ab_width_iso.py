"""Serving beam-width x L grid at iso-recall (VERDICT r4 item 1b).

E>1 visits E nodes per hop, halving hop count (the fixed 0.06 ms/hop
skeleton + merge amortize over 2x visits) at the cost of ~2x per-hop
frontier work. The question: does (W=2, L=50) beat (W=1, L=100) at equal
recall? Also A/Bs INT8 node vectors (item 1c): the visited-node vector
gather is 1.5% of the hop (profile_searcher), so the expected serving
delta is ~nothing — INT8 nodes' real value is memory (GIST-1M fit).

Usage: python benchmarks/ab_width_iso.py [N]
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
    dims, k, nq = 128, 10, 4096
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
    from duckdb_lm_diskann_tpu.core.searcher import beam_search_many
    from duckdb_lm_diskann_tpu.ops.distance import all_pairs_distance

    gen, rng = make_corpus(n, dims)
    data = gen(n)
    qidx = rng.integers(0, n, nq)
    queries = data[qidx] + 0.01 * rng.standard_normal((nq, dims)).astype(
        np.float32
    )
    q_dev = jnp.asarray(queries)

    # ground truth (chunked)
    gt = []
    for s in range(0, nq, 512):
        d = np.asarray(all_pairs_distance(
            q_dev[s : s + 512], jnp.asarray(data), MetricType.L2))
        gt.append(np.argpartition(d, k, axis=1)[:, :k])
    gt_sets = [set(r.tolist()) for r in np.concatenate(gt)]

    def build(node_t):
        cfg = LmDiskannConfig(
            metric_type=MetricType.L2, r=64, l_insert=128, alpha=1.2,
            l_search=100, dimensions=dims, node_vector_type=node_t,
            edge_type=EdgeType.INT4,
        )
        cfg.validate()
        coord = Coordinator(cfg, initial_capacity=n)
        t0 = time.perf_counter()
        coord.bulk_build(list(range(n)), data, max_batch=2048)
        _sync(coord.arrays)
        return coord, time.perf_counter() - t0

    def serve(coord, width, L, reps=3):
        B = 1024
        nb = nq // B
        qs = q_dev.reshape(nb, B, dims)
        entry = jnp.int32(coord.entry_slot)

        def call():
            return beam_search_many(
                coord.arrays, qs, entry, params=coord.params, l_search=L,
                k=k, beam_width=width, assume_all_valid=True,
            )

        res = call()
        _sync(res)
        best = 1e30
        for _ in range(reps):
            t1 = time.perf_counter()
            out = call()
            _sync(out)
            best = min(best, time.perf_counter() - t1)
        ids = np.asarray(res.topk_slots).reshape(-1, k)
        rec = np.mean([
            len(set(ids[i].tolist()) & gt_sets[i]) / k for i in range(nq)
        ])
        return nq / best, rec

    coord, bs = build(VectorType.FLOAT32)
    print(f"# built f32 nodes in {bs:.1f}s", flush=True)
    for width in (1, 2, 4):
        for L in (50, 75, 100):
            qps, rec = serve(coord, width, L)
            print(f"W={width} L={L:3d}: {qps:9.1f} qps  recall={rec:.4f}",
                  flush=True)
    del coord

    coord, bs = build(VectorType.INT8)
    print(f"# built INT8 nodes in {bs:.1f}s", flush=True)
    for L in (50, 100):
        qps, rec = serve(coord, 1, L)
        print(f"int8 nodes W=1 L={L:3d}: {qps:9.1f} qps  recall={rec:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
