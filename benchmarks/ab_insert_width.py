"""A/B: insert-path beam width (config.insert_beam_width) and serving beam
width at 100k x 128d INT4/L2 — build seconds, steady insert rate, recall,
serving QPS per width.

Run exclusively on the TPU (one process at a time). The E>1 hop path lost
its O((E*R)^2) duplicate mask (merge_beams dedup), so widths measured
before that change are stale.
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax

_REPO = Path(__file__).resolve().parent.parent
jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
sys.path.insert(0, str(_REPO))
import jax.numpy as jnp

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType, VectorType
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
from duckdb_lm_diskann_tpu.core.searcher import beam_search
from duckdb_lm_diskann_tpu.ops.distance import all_pairs_distance

from bench import make_corpus  # pinned manifold generator

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, K, L = 128, 10, 100
NQ = min(2048, N)
B = min(1024, NQ)

gen, rng = make_corpus(N, D)
data = gen(N)
qidx = rng.integers(0, N, NQ)
queries = data[qidx] + 0.01 * rng.standard_normal((NQ, D)).astype(np.float32)

# Ground truth (exact top-k by brute force, segmented).
q_dev = jnp.asarray(queries)
d_dev = jnp.asarray(data)
gt = []
for i in range(0, NQ, 256):
    dist = all_pairs_distance(q_dev[i : i + 256], d_dev, MetricType.L2)
    gt.append(np.asarray(jax.lax.top_k(-dist, K)[1]))
gt = np.concatenate(gt)

for insert_w in (1, 2, 4):
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=64, l_insert=128, alpha=1.2,
        l_search=L, dimensions=D, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT4, insert_beam_width=insert_w,
    )
    cfg.validate()
    t0 = time.perf_counter()
    coord = Coordinator(cfg, initial_capacity=N)
    coord.bulk_build(list(range(N)), data, max_batch=1024)
    build_s = time.perf_counter() - t0
    durs = [t for _, t in coord.build_timings]
    compile_s = sum(t for t in durs if t > 1.0)

    for serve_w in (1, 2, 4):
        def run_batch(qb):
            return beam_search(
                coord.arrays, qb, jnp.int32(coord.entry_slot),
                params=coord.params, l_search=L, k=K, beam_width=serve_w,
                assume_all_valid=True,  # fresh build, no tombstones
            )

        def sync(o):  # hard host pull; block_until_ready can return early
            return np.asarray(o.topk_dists[:1, :1])

        res = run_batch(q_dev[:B])
        sync(res)
        best = 0.0
        for _ in range(3):
            t1 = time.perf_counter()
            outs = [run_batch(q_dev[i * B : (i + 1) * B])
                    for i in range(NQ // B)]
            sync(outs[-1])
            best = max(best, NQ / (time.perf_counter() - t1))
        ids = np.concatenate(
            [np.asarray(o.topk_slots) for o in outs])
        recall = float(np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / K
            for i in range(NQ)
        ]))
        print(
            f"insert_w={insert_w} serve_w={serve_w}: build={build_s:.1f}s "
            f"(compile~{compile_s:.0f}s, steady {N/max(build_s-compile_s,1e-9):.0f}/s) "
            f"qps={best:.0f} recall@{K}={recall:.4f}",
            flush=True,
        )
