"""Dynamic-op lifecycle tests: insert/delete/update/vacuum/drop.

Semantics pinned to Coordinator::Delete/PerformVacuum/Update/HandleCommitDrop
(Coordinator.cpp:176-237, :319-368) and libSQL's eager back-edge unlink
(vectordiskann.c:1626-1700), validated against the oracle.
"""

import numpy as np
import pytest

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType, VectorType
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.coordinator import Coordinator

from tests.oracle import OracleGraph, brute_force_topk


def make_coord(metric=MetricType.COSINE, dims=12, **kw):
    cfg = LmDiskannConfig(
        metric_type=metric, r=8, l_insert=16, l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32, **kw,
    )
    return Coordinator(cfg, initial_capacity=256)


def test_delete_matches_oracle(rng):
    dims, n = 12, 60
    coord = make_coord(dims=dims)
    oracle = OracleGraph(dims, 8, MetricType.COSINE, EdgeType.TERNARY,
                         1.2, 16, 32)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    for i in range(n):
        coord.insert([i], data[i : i + 1])
        oracle.insert(i, data[i])

    victims = [5, 17, 33]
    # Sequential deletes match the oracle's one-at-a-time repair semantics
    # exactly; batched deletes use the documented del-set-aware batch rule.
    for v in victims:
        assert coord.delete([v]) == 1
        oracle.delete(v)
    assert coord.count == n - 3

    # Graph topology after delete must match. Both sides eagerly unlink
    # back-edges listed by the deleted node; one-way in-edges remain as
    # zombies on both sides (filtered by the valid mask at search time).
    nbrs = np.asarray(coord.arrays.neighbors)
    valid = np.asarray(coord.arrays.valid)
    for i in range(n):
        if i in victims:
            assert not valid[i]
            continue
        got = [int(s) for s in nbrs[i] if s >= 0]
        assert got == oracle.neighbors[i], f"node {i}"

    # Search agreement after delete.
    queries = rng.standard_normal((4, dims)).astype(np.float32)
    ids, _ = coord.search(queries, 5)
    for b in range(4):
        want_ids, want_dists, _, _ = oracle.search(queries[b], 5)
        assert ids[b].tolist() == want_ids
    assert not np.isin(ids, victims).any()


def test_delete_missing_rows_silently_skipped(rng):
    coord = make_coord()
    data = rng.standard_normal((10, 12)).astype(np.float32)
    coord.insert(list(range(10)), data)
    # vectordiskann.c:1646-1650: nothing to delete -> silent success.
    assert coord.delete([999]) == 0
    assert coord.count == 10


def test_entry_point_fallback_on_delete(rng):
    coord = make_coord()
    data = rng.standard_normal((20, 12)).astype(np.float32)
    coord.insert(list(range(20)), data)
    entry = coord.entry_rowid
    coord.delete([entry])
    assert coord.entry_rowid != entry
    assert coord.entry_slot >= 0
    ids, _ = coord.search(data[:2], 3)
    assert (ids >= 0).all()
    # Delete everything: entry goes invalid, search returns empty.
    coord.delete(list(range(20)))
    assert coord.entry_slot == -1
    ids, dists = coord.search(data[:2], 3)
    assert (ids == -1).all() and np.isinf(dists).all()


def test_vacuum_recycles_slots(rng):
    coord = make_coord()
    data = rng.standard_normal((30, 12)).astype(np.float32)
    coord.insert(list(range(30)), data)
    coord.delete([3, 4, 5])
    # Slots are quarantined until vacuum (deletion queue), so new inserts
    # must NOT reuse them yet.
    coord.insert([100], rng.standard_normal((1, 12)).astype(np.float32))
    assert coord.allocator.rowid_to_slot[100] == 30
    assert coord.vacuum() == 3
    # Now freed slots get reused.
    coord.insert([101], rng.standard_normal((1, 12)).astype(np.float32))
    assert coord.allocator.rowid_to_slot[101] in {3, 4, 5}
    ids, _ = coord.search(data[:2], 5)
    assert not np.isin(ids, [3, 4, 5]).any()


def test_update_is_delete_plus_insert(rng):
    coord = make_coord()
    data = rng.standard_normal((20, 12)).astype(np.float32)
    coord.insert(list(range(20)), data)
    new_vec = rng.standard_normal(12).astype(np.float32)
    coord.update(7, new_vec)
    assert coord.count == 20
    ids, dists = coord.search(new_vec[None, :], 1)
    assert ids[0, 0] == 7
    assert dists[0, 0] < 1e-5  # cosine distance to itself


def test_duplicate_rowid_rejected(rng):
    coord = make_coord()
    coord.insert([1], rng.standard_normal((1, 12)).astype(np.float32))
    with pytest.raises(KeyError):
        coord.insert([1], rng.standard_normal((1, 12)).astype(np.float32))


def test_dimension_mismatch_rejected(rng):
    coord = make_coord()
    with pytest.raises(ValueError, match="dimensions"):
        coord.insert([1], rng.standard_normal((1, 5)).astype(np.float32))
    with pytest.raises(ValueError, match="dimensions"):
        coord.search(rng.standard_normal((1, 5)).astype(np.float32), 3)


def test_commit_drop_resets(rng):
    coord = make_coord()
    coord.insert(list(range(5)),
                 rng.standard_normal((5, 12)).astype(np.float32))
    coord.handle_commit_drop()
    assert coord.count == 0 and coord.entry_slot == -1 and not coord.dirty


def test_capacity_growth(rng):
    from tests.test_build import clustered_data

    coord = make_coord()
    n = 700  # > initial 256 capacity
    data = clustered_data(rng, n, 12, n_clusters=20)
    coord.bulk_build(list(range(n)), data, max_batch=128)
    assert coord.capacity >= n and coord.count == n
    ids, _ = coord.search(data[:8], 10)
    truth = brute_force_topk(data[:8], data, MetricType.COSINE, 10)
    rec = np.mean([
        len(set(ids[b].tolist()) & set(truth[b].tolist())) / 10
        for b in range(8)
    ])
    assert rec >= 0.8


def test_in_memory_size_accounting(rng):
    coord = make_coord()
    size = coord.get_in_memory_size()
    # vectors + neighbors + valid + ternary planes at capacity 256
    assert size > 256 * 12 * 4
    coord.insert([0], rng.standard_normal((1, 12)).astype(np.float32))
    assert coord.get_in_memory_size() == size  # preallocated


def test_auto_checkpoint_daemon(tmp_path, rng):
    """Background flush daemon (Consolidated Proposal:96-107): deltas are
    persisted without explicit checkpoint() calls, concurrently with
    foreground DML, and a reopened database sees everything."""
    from duckdb_lm_diskann_tpu.db.database import connect

    data = rng.standard_normal((120, 8)).astype(np.float32)
    db = connect(str(tmp_path / "db"))
    t = db.create_table("x", {"vec": data})
    db.create_index(
        "v", t, "vec", options={"metric": "l2", "r": 4, "l_insert": 8}
    )
    db.start_auto_checkpoint(interval_s=0.2)
    import time as _t

    # Foreground DML while the daemon checkpoints underneath.
    added = []
    for i in range(4):
        rows = rng.standard_normal((5, 8)).astype(np.float32)
        t.insert({"vec": rows})
        added.append(rows)
        _t.sleep(0.15)
    idx = next(iter(t.indexes.values())).index
    deadline = _t.time() + 10
    while idx.coordinator.dirty and _t.time() < deadline:
        _t.sleep(0.1)
    assert not idx.coordinator.dirty, "daemon never checkpointed"
    db.stop_auto_checkpoint()

    # Reopen with the full table contents: the persisted index matches the
    # table's row set exactly, so create_index reuses it without a rebuild.
    full = np.concatenate([data] + added)
    db2 = connect(str(tmp_path / "db"))
    t2 = db2.create_table("x", {"vec": full})
    db2.create_index(
        "v", t2, "vec", options={"metric": "l2", "r": 4, "l_insert": 8}
    )
    idx2 = next(iter(t2.indexes.values())).index
    assert idx2.coordinator.count == 140
    assert not idx2.coordinator.dirty  # loaded, not rebuilt
