"""HARD-corpus BUILD-side recall sweep (VERDICT r4 item 2).

The search-side axis is saturated (ab_hard_recall.py: seeds/L flat, strict
0.95 extrapolates to L~500). This sweep attacks construction: the
post-build refine pass (Vamana second pass + reachability repair) and
R/L_insert scaling, measured on strict recall@10 with the shipped
adaptive seeding at L in {100, 150, 200}.

Usage: python benchmarks/ab_hard_build.py [N] [configs]
  configs: comma list of base|refine|r96|r96refine|a13refine (default all)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    which = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["base", "refine", "r96", "r96refine", "a13refine"]
    )
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

    # ground truth, chunked
    q_dev = jnp.asarray(queries)
    best_d = np.full((nq, k), np.inf, np.float32)
    best_i = np.full((nq, k), -1, np.int64)
    chunk = 25_000
    for s in range(0, n, chunk):
        d = np.asarray(all_pairs_distance(
            q_dev, jnp.asarray(data[s : s + chunk]), MetricType.L2))
        kk = min(k, d.shape[1] - 1)
        ii = np.argpartition(d, kk, axis=1)[:, :k]
        dd = np.take_along_axis(d, ii, axis=1)
        cd = np.concatenate([best_d, dd], axis=1)
        ci = np.concatenate([best_i, ii + s], axis=1)
        sel = np.argsort(cd, axis=1)[:, :k]
        best_d = np.take_along_axis(cd, sel, axis=1)
        best_i = np.take_along_axis(ci, sel, axis=1)
    gt = best_i
    gt_sets = [set(r.tolist()) for r in gt]

    def build(r, l_insert, alpha):
        cfg = LmDiskannConfig(
            metric_type=MetricType.L2, r=r, l_insert=l_insert, alpha=alpha,
            l_search=100, dimensions=dims,
            node_vector_type=VectorType.FLOAT32, edge_type=EdgeType.INT4,
        )
        cfg.validate()
        coord = Coordinator(cfg, initial_capacity=n)
        t0 = time.perf_counter()
        coord.bulk_build(list(range(n)), data, max_batch=2048)
        return coord, time.perf_counter() - t0

    def recall(coord, l_search):
        ids, _ = coord.search(
            queries, k, l_search=l_search, adaptive_seeds=2,
            seed_sample=4096, batch_size=1000,
        )
        return float(np.mean([
            len(set(ids[i].tolist()) & gt_sets[i]) / k for i in range(nq)
        ]))

    out = {}
    cfgs = {
        "base": (64, 128, 1.2, False),
        "refine": (64, 128, 1.2, True),
        "r96": (96, 192, 1.2, False),
        "r96refine": (96, 192, 1.2, True),
        "a13refine": (64, 128, 1.3, True),
    }
    for name in which:
        r, li, alpha, do_refine = cfgs[name]
        coord, bt = build(r, li, alpha)
        rt = 0.0
        if do_refine:
            t0 = time.perf_counter()
            coord.refine()
            rt = time.perf_counter() - t0
        row = {"build_s": round(bt, 1), "refine_s": round(rt, 1)}
        for L in (100, 150, 200):
            row[f"recall_L{L}"] = round(recall(coord, L), 4)
        out[name] = row
        print(f"{name:10s} {json.dumps(row)}", flush=True)
        del coord

    print(json.dumps(out))


if __name__ == "__main__":
    main()
