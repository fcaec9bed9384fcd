"""HARD-corpus recall sweep: spend the adaptive-seeding visit savings.

Round-4 state (benchmarks/NOTES.md): strict recall@10 on the 50k HARD
stressor is 0.891 baseline / 0.9125 with adaptive seeds (2 of a 4096
sample) at L=100 — and the adaptive path is 2x FASTER (22.4k vs 11.0k
qps) because seeded beams converge in fewer hops. This sweep spends that
headroom: more seeds, bigger samples, higher L, beam width 2 — looking
for a config that reaches the 0.95 stressor target at >= baseline qps.

Usage: python benchmarks/ab_hard_recall.py [N]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dims, k, nq = 128, 10, 1000
    import jax.numpy as jnp

    from duckdb_lm_diskann_tpu.common.types import (
        EdgeType, MetricType, VectorType,
    )
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.ops.distance import all_pairs_distance
    from duckdb_lm_diskann_tpu.utils.corpora import make_hard_corpus

    gen, rng = make_hard_corpus(n, dims, 0x4A2D)
    data = gen(n)
    qidx = rng.integers(0, n, nq)
    queries = data[qidx] + 0.01 * rng.standard_normal((nq, dims)).astype(
        np.float32
    )

    cfg = LmDiskannConfig(
        metric_type=MetricType.L2,
        r=64,
        l_insert=128,
        alpha=1.2,
        l_search=100,
        dimensions=dims,
        node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT4,
    )
    cfg.validate()
    t0 = time.perf_counter()
    coord = Coordinator(cfg, initial_capacity=n)
    coord.bulk_build(list(range(n)), data, max_batch=2048)
    print(f"# built n={n} in {time.perf_counter() - t0:.1f}s", flush=True)

    # Brute-force ground truth (chunked over base rows on device).
    q_dev = jnp.asarray(queries)
    best_d = np.full((nq, k), np.inf, np.float32)
    best_i = np.full((nq, k), -1, np.int64)
    chunk = 25_000
    for s in range(0, n, chunk):
        d = np.asarray(
            all_pairs_distance(
                q_dev, jnp.asarray(data[s : s + chunk]), MetricType.L2
            )
        )
        # argpartition needs kth < row width; a tail chunk narrower than k
        # (custom N values) just takes every column instead.
        if d.shape[1] > k:
            ii = np.argpartition(d, k, axis=1)[:, :k]
        else:
            ii = np.broadcast_to(
                np.arange(d.shape[1])[None, :], (d.shape[0], d.shape[1])
            ).copy()
        dd = np.take_along_axis(d, ii, axis=1)
        cd = np.concatenate([best_d, dd], axis=1)
        ci = np.concatenate([best_i, ii + s], axis=1)
        sel = np.argsort(cd, axis=1)[:, :k]
        best_d = np.take_along_axis(cd, sel, axis=1)
        best_i = np.take_along_axis(ci, sel, axis=1)
    gt = best_i
    # epsilon-recall threshold: distance within 1% of the k-th true dist
    eps_thr = best_d[:, k - 1] * 1.01 + 1e-12

    def measure(tag, **kw):
        t0 = time.perf_counter()
        r1, d1 = coord.search(queries, k, batch_size=1024, **kw)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            coord.search(queries, k, batch_size=1024, **kw)
        qps = nq * reps / (time.perf_counter() - t0)
        hit = np.fromiter(
            (
                len(set(gt[i]) & set(r1[i])) / k
                for i in range(nq)
            ),
            np.float64,
        )
        eps_ok = (d1 <= eps_thr[:, None]).mean()
        print(
            json.dumps(
                dict(
                    tag=tag,
                    recall=round(float(hit.mean()), 4),
                    eps1=round(float(eps_ok), 4),
                    qps=round(qps, 1),
                    warm_s=round(warm, 2),
                    **{k_: v for k_, v in kw.items()},
                )
            ),
            flush=True,
        )
        return float(hit.mean()), qps

    measure("baseline", l_search=100)
    for s_, m_, l_ in [
        (2, 4096, 100),
        (4, 4096, 100),
        (8, 4096, 100),
        (4, 8192, 100),
        (8, 8192, 100),
        (4, 8192, 150),
        (8, 8192, 150),
        (4, 8192, 200),
        (8, 8192, 200),
        (8, 16384, 150),
    ]:
        measure(
            f"adaptive s{s_} m{m_} L{l_}",
            l_search=l_, adaptive_seeds=s_, seed_sample=m_,
        )
    # beam width 2: twice the frontier expansions per hop
    measure("W2 s8 m8192 L100", l_search=100, beam_width=2,
            adaptive_seeds=8, seed_sample=8192)
    measure("W2 s8 m8192 L150", l_search=150, beam_width=2,
            adaptive_seeds=8, seed_sample=8192)


if __name__ == "__main__":
    main()
