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


def test_delete_orphan_rescue(rng):
    """Deleting ALL in-neighbors of a node must not strand it: the delete
    path's in-link guarantee force-links it from a live ex-sibling, so a
    query at the node still finds it (libSQL's unlink-only delete — and
    the reference with it — leaves such nodes permanently unreachable)."""
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=4, l_insert=8, alpha=1.2, l_search=64,
        dimensions=8, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT8,
    )
    cfg.validate()
    n = 80
    data = rng.standard_normal((n, 8)).astype(np.float32)
    coord = Coordinator(cfg)
    coord.bulk_build(list(range(n)), data)

    # Pick a target that is not the entry point, find its in-neighbors.
    import jax.numpy as jnp

    nbrs = np.asarray(coord.arrays.neighbors[: coord.allocator.high_water])
    stranded = 0
    rescued = 0
    for x in range(1, n):
        if x == coord.entry_slot:
            continue
        in_nbrs = np.nonzero((nbrs == x).any(axis=1))[0]
        in_rows = [int(coord.allocator.slot_to_rowid[s]) for s in in_nbrs
                   if s in coord.allocator.slot_to_rowid and s != x]
        if not (1 <= len(in_rows) <= 6):
            continue
        x_row = coord.allocator.slot_to_rowid[x]
        if x_row in in_rows:
            continue
        coord.delete(in_rows)
        ids, _ = coord.search(data[x][None, :], 3, l_search=64, n_seeds=1)
        if x_row not in ids[0].tolist():
            stranded += 1
        else:
            rescued += 1
        break  # one scenario is enough; loop just finds a suitable x
    assert rescued == 1 and stranded == 0


def test_rescue_orphans_round_mechanism(rng):
    """Unit test of the delete-path in-link guarantee: a valid node with
    zero in-links in the neighbor table gets force-linked from its nearest
    live ex-sibling, and the adopter's row is marked dirty."""
    import jax.numpy as jnp

    from duckdb_lm_diskann_tpu.core.builder import rescue_orphans_round
    from duckdb_lm_diskann_tpu.core.graph import GraphParams, make_graph_arrays

    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=4, l_insert=8, alpha=1.2, l_search=16,
        dimensions=4, node_vector_type=VectorType.FLOAT32,
        edge_type=EdgeType.INT8,
    )
    cfg.validate()
    params = GraphParams.from_config(cfg)
    arrays = make_graph_arrays(params, 64)
    vecs = rng.standard_normal((64, 4)).astype(np.float32)
    arrays = arrays._replace(
        vectors=jnp.asarray(vecs),
        valid=jnp.zeros(64, bool).at[jnp.arange(6)].set(True),
        # 0<->1, 2<->3 linked; node 4 has NO in-links; node 5 points at 0.
        neighbors=jnp.asarray(np.array(
            [[1, -1, -1, -1],
             [0, -1, -1, -1],
             [3, -1, -1, -1],
             [2, -1, -1, -1],
             [0, 1, -1, -1],
             [0, -1, -1, -1]] + [[-1] * 4] * 58, np.int32)),
    )
    # Affected set: node 4 (orphan) and node 1 (has an in-link from 0).
    tgt = jnp.asarray(np.array([4, 1] + [-1] * 6, np.int32))
    sibs = jnp.asarray(np.array(
        [[1, 2, 3, 5], [0, 2, -1, -1]] + [[-1] * 4] * 6, np.int32))
    dels = jnp.asarray(np.full(4, -1, np.int32))
    out, adopters = rescue_orphans_round(
        arrays, tgt, sibs, dels, params=params
    )
    nbrs = np.asarray(out.neighbors)
    adopters = [a for a in np.asarray(adopters).tolist() if a >= 0]
    # Node 4 adopted by exactly one sibling; node 1 untouched (has in-link).
    assert len(adopters) == 1
    assert 4 in nbrs[adopters[0]].tolist()
    # Nearest live sibling chosen.
    d = np.linalg.norm(vecs[[1, 2, 3, 5]] - vecs[4], axis=1)
    assert adopters[0] == [1, 2, 3, 5][int(np.argmin(d))]
    assert bool(np.asarray(out.dirty_rows)[adopters[0]])


def test_repair_reachability_fixpoint(rng):
    """Vacuum's reachability repair: every live node unreachable from the
    entry point gets force-linked back into the graph; repeated vacuums
    reach (or hold) full reachability even at tiny R where replace/prune
    eviction strands several percent of a bulk build."""
    from duckdb_lm_diskann_tpu.utils.verify import verify_graph

    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, alpha=1.2,
        l_search=64, dimensions=24,
        node_vector_type=VectorType.FLOAT32, edge_type=EdgeType.INT4,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    data = rng.standard_normal((500, 24)).astype(np.float32)
    coord.bulk_build(list(range(500)), data)
    pre = verify_graph(coord)["reachable_fraction"]
    n = coord.repair_reachability()
    post = verify_graph(coord)["reachable_fraction"]
    assert post >= max(pre, 0.99)
    if pre < 1.0:
        assert n > 0 and post > pre
    # Churn then vacuum: repair keeps running as part of vacuum.
    coord.insert(
        list(range(1000, 1050)),
        rng.standard_normal((50, 24)).astype(np.float32),
    )
    coord.delete(list(range(40, 80)))
    coord.vacuum()
    coord.vacuum()  # fixpoint: second pass converges any stragglers
    assert verify_graph(coord)["reachable_fraction"] == 1.0


def test_recall_under_churn(rng):
    """Quality pin: heavy delete churn + vacuum must keep recall vs brute
    force high (repair keeps the graph navigable; zombie filtering keeps
    results clean)."""
    from tests.oracle import brute_force_topk

    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=16, l_insert=32, alpha=1.2,
        l_search=64, dimensions=16,
        node_vector_type=VectorType.FLOAT32, edge_type=EdgeType.INT8,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    n = 600
    data = rng.standard_normal((n, 16)).astype(np.float32)
    coord.bulk_build(list(range(n)), data)
    # Delete 30%, vacuum (repairs reachability), then measure recall over
    # the survivors.
    victims = rng.choice(n, n * 3 // 10, replace=False)
    coord.delete(victims.tolist())
    coord.vacuum()
    alive = np.setdiff1d(np.arange(n), victims)
    queries = data[alive[:32]] + 0.01 * rng.standard_normal(
        (32, 16)
    ).astype(np.float32)
    ids, _ = coord.search(queries, 10, l_search=64)
    truth = brute_force_topk(queries, data[alive], MetricType.L2, 10)
    truth_ids = alive[truth]  # map brute-force positions back to rowids
    rec = np.mean([
        len(set(ids[b].tolist()) & set(truth_ids[b].tolist())) / 10
        for b in range(32)
    ])
    assert not np.isin(ids, victims).any()
    assert rec >= 0.9, rec


def test_reopen_with_changed_vectors_rebuilds(tmp_path, rng):
    """create_index must not reuse a persisted index when the table holds
    the same rowids but DIFFERENT vectors (stale-graph hazard)."""
    from duckdb_lm_diskann_tpu.db.database import connect

    data = rng.standard_normal((60, 8)).astype(np.float32)
    db = connect(str(tmp_path / "db"))
    t = db.create_table("x", {"vec": data})
    db.create_index("v", t, "vec", options={"metric": "l2", "r": 4, "l_insert": 8})
    db.checkpoint()

    changed = data.copy()
    changed[10] = -changed[10] * 3.0  # same rowids, different content
    db2 = connect(str(tmp_path / "db"))
    t2 = db2.create_table("x", {"vec": changed})
    db2.create_index("v", t2, "vec", options={"metric": "l2", "r": 4, "l_insert": 8})
    idx2 = next(iter(t2.indexes.values())).index
    slot = idx2.coordinator.allocator.rowid_to_slot[10]
    stored = np.asarray(idx2.coordinator.arrays.vectors[slot])
    np.testing.assert_allclose(stored, changed[10], atol=1e-6)


def test_daemon_does_not_resurrect_dropped_index(tmp_path, rng):
    """A pending auto-checkpoint tick racing drop_index must not recreate
    the dropped index's directory."""
    import time as _t

    from duckdb_lm_diskann_tpu.db.database import connect

    data = rng.standard_normal((80, 8)).astype(np.float32)
    db = connect(str(tmp_path / "db"))
    t = db.create_table("x", {"vec": data})
    db.create_index("v", t, "vec", options={"metric": "l2", "r": 4, "l_insert": 8})
    idx = next(iter(t.indexes.values())).index
    directory = idx.directory
    db.start_auto_checkpoint(interval_s=0.1)
    t.insert({"vec": rng.standard_normal((3, 8)).astype(np.float32)})
    db.drop_index(t, "v")
    assert not directory.exists()
    # Simulate the worst race directly: a tick that had already captured
    # the index object calls persist_to_disk after the drop.
    idx.coordinator.dirty = True
    idx.persist_to_disk()
    _t.sleep(0.4)
    db.stop_auto_checkpoint()
    assert not directory.exists(), "daemon resurrected a dropped index dir"
