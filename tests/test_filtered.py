"""Filtered search (the V2 design's filtered-search plan, Consolidated
Proposal:419): traversal routes through all nodes, the final top-k is taken
over visited-and-allowed rows only. The planner pushes residual predicates
into the scan (session option lm_diskann_filter_pushdown, default on); off
reproduces the reference's pull-up-only post-filter
(hnsw_optimize_scan.cpp:160-200, fewer-than-k results possible)."""

import numpy as np
import pytest

from duckdb_lm_diskann_tpu.common.types import MetricType, VectorType
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
from duckdb_lm_diskann_tpu.db.database import connect


def _build(rng, n=400, dims=16):
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=64,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        # the exactness test below searches with L >= n so the walk can
        # visit the whole graph; the visit budget must not bind
        max_visits=2048,
    )
    cfg.validate()
    coord = Coordinator(cfg, initial_capacity=n)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    coord.bulk_build(list(range(n)), data, max_batch=64)
    return coord, data


def test_filtered_search_exact_over_allowed(rng):
    """With L >= n and a non-binding visit budget the walk visits every
    node reachable from the entry point, so filtered top-k must equal
    brute-force top-k over (allowed AND reachable) rows."""
    coord, data = _build(rng)
    n = data.shape[0]
    allowed = np.arange(0, n, 3, dtype=np.int64)  # every 3rd row

    # Host BFS over the neighbor table: the reachable set from the entry.
    nbrs = np.asarray(coord.arrays.neighbors)
    seen = {int(coord.entry_slot)}
    stack = [int(coord.entry_slot)]
    while stack:
        cur = stack.pop()
        for s in nbrs[cur]:
            if s >= 0 and int(s) not in seen:
                seen.add(int(s))
                stack.append(int(s))
    eligible = np.asarray(
        sorted(set(allowed.tolist()) & seen), np.int64
    )

    q = data[rng.integers(0, n, 8)]
    ids, dists = coord.search(q, 5, l_search=512, allowed_rowids=allowed)
    d = np.linalg.norm(data[None, eligible] - q[:, None], axis=-1)
    order = np.argsort(d, axis=-1, kind="stable")[:, :5]
    for b in range(q.shape[0]):
        got = [i for i in ids[b].tolist() if i >= 0]
        assert set(got) <= set(allowed.tolist())
        truth = eligible[order[b]].tolist()
        assert got == truth, f"query {b}: {got} != {truth}"


def test_filtered_search_no_filter_unchanged(rng):
    """allowed_rowids=None must be byte-identical to the unfiltered path."""
    coord, data = _build(rng, n=200)
    q = data[:4]
    a_ids, a_d = coord.search(q, 5, l_search=64)
    b_ids, b_d = coord.search(q, 5, l_search=64, allowed_rowids=None)
    assert (a_ids == b_ids).all() and (a_d == b_d).all()


@pytest.fixture
def db_filtered(rng):
    db = connect()
    n, dims = 300, 12
    data = rng.standard_normal((n, dims)).astype(np.float32)
    t = db.create_table(
        "x", {"vec": data, "label": np.arange(n, dtype=np.int64) % 10}
    )
    db.create_index("idx", t, "vec", options={
        "metric": "l2", "r": 8, "l_insert": 16, "l_search": 64})
    return db, t, data


def test_pushdown_returns_k_where_pullup_starves(db_filtered):
    """A selective predicate (10% of rows): pushdown fills k from the
    visited set; the reference-parity pull-up post-filter returns fewer."""
    db, t, data = db_filtered

    def label_zero(table, rowids):
        return table.fetch(rowids, "label") == 0

    res, plan = db.knn(t, "vec", data[0], 10, metric="l2",
                       filter=label_zero, return_plan=True)
    labels = t.fetch(res["row_ids"], "label")
    assert (labels == 0).all()
    assert len(res["row_ids"]) == 10  # pushdown fills k

    db.set_option("lm_diskann_filter_pushdown", False)
    res2, _ = db.knn(t, "vec", data[0], 10, metric="l2",
                     filter=label_zero, return_plan=True)
    labels2 = t.fetch(res2["row_ids"], "label")
    assert (labels2 == 0).all()
    assert len(res2["row_ids"]) <= len(res["row_ids"])
    # pushdown's results must be at least as close as pull-up's
    assert set(res2["row_ids"].tolist()) <= set(res["row_ids"].tolist()) or (
        res["distance"][: len(res2["distance"])] <= res2["distance"] + 1e-6
    ).all()
