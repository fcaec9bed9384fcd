"""Standalone GIST1M-class capacity run: distributed_build + sharded
search + recall at 960d/TERNARY on the virtual 8-device CPU mesh.

The full 1M x 960d distributed build is hours of XLA-CPU compute on this
4-core box, so N is an argument; the interesting claims at any N:

  - the build itself runs with per-device graph memory = total/8 (the
    replicated Coordinator arrays stay empty);
  - recall@10 vs exact brute force at the paper's dimensionality;
  - measured build/search rates to extrapolate the 1M figure.

Usage: python benchmarks/paper_scale_gist1m.py [N] [MAX_BATCH]
Writes benchmarks/paper_scale_gist1m.json.
"""

import json
import os
import sys
import time

# `python benchmarks/paper_scale_gist1m.py` puts benchmarks/ (not the repo
# root) on sys.path; add the package's parent explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    from duckdb_lm_diskann_tpu.common.types import (
        EdgeType,
        MetricType,
        VectorType,
    )
    from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
    from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
    from duckdb_lm_diskann_tpu.parallel.global_graph import GlobalShardedIndex
    from duckdb_lm_diskann_tpu.parallel.mesh import make_mesh

    # Defaults sized for the XLA-CPU virtual mesh: the 8-device EMULATION
    # holds every shard's replicated program buffers in one process and
    # its memory grows far past the real per-chip footprint (2048-row and
    # 8192-row runs of the 960d insert program peaked ~130 GB host RSS
    # and were OOM-killed on a 125 GB box; 1024 rows completes — while
    # the true graph state at these sizes is <200 MB). Real multi-chip
    # HBM behavior is what tests/test_paper_scale.py's 1Mx960d allocation
    # test pins; this script's value is the end-to-end distributed-build
    # recall measurement at the paper's dimensionality.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    max_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    d = 960
    cfg = LmDiskannConfig(
        metric_type=MetricType.COSINE, r=r, l_insert=2 * r, l_search=100,
        dimensions=d, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.TERNARY,
    )
    cfg.validate()
    rng = np.random.default_rng(0x6157)
    z = rng.standard_normal((n, 24)).astype(np.float32)
    w = (rng.standard_normal((24, d)) / 5).astype(np.float32)
    data = np.tanh(z @ w) + 0.02 * rng.standard_normal((n, d)).astype(
        np.float32
    )

    coord = Coordinator(cfg, initial_capacity=8)
    gidx = GlobalShardedIndex(coord, mesh=make_mesh(8))
    t0 = time.perf_counter()
    gidx.distributed_build(list(range(n)), data, max_batch=max_batch)
    build_s = time.perf_counter() - t0
    assert not bool(np.asarray(coord.arrays.valid).any())
    total = sum(f.nbytes for f in gidx._stacked if f.size)
    per_dev = total / 8

    nq = min(512, n)
    q = data[:nq] + 0.01 * rng.standard_normal((nq, d)).astype(np.float32)
    t1 = time.perf_counter()
    ids, _ = gidx.search(q, 10, l_search=100)
    search_s = time.perf_counter() - t1

    dn = data / np.linalg.norm(data, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    truth = np.argsort(-(qn @ dn.T), axis=1)[:, :10]
    hits = sum(
        len(set(ids[i].tolist()) & set(truth[i].tolist())) for i in range(nq)
    )
    out = {
        "n": n,
        "dims": d,
        "edge_type": "ternary",
        "r": cfg.r,
        "build_seconds": round(build_s, 1),
        "search_seconds": round(search_s, 1),
        "recall_at_10_l100": round(hits / (nq * 10), 4),
        "graph_bytes_total": total,
        "graph_bytes_per_device": per_dev,
        "backend": "cpu-virtual-8dev",
    }
    path = os.path.join(os.path.dirname(__file__), "paper_scale_gist1m.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
