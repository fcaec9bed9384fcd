"""Snapshot isolation (MVCC) — Consolidated Proposal:82-96's commit-epoch
visibility realized structurally by the functional array design."""

import numpy as np
import pytest

from duckdb_lm_diskann_tpu.common.types import MetricType, VectorType
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.coordinator import Coordinator


def make_coord(rng, n=120, dims=16):
    cfg = LmDiskannConfig(
        metric_type=MetricType.L2, r=8, l_insert=16, l_search=48,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
    )
    cfg.validate()
    coord = Coordinator(cfg)
    data = rng.standard_normal((n, dims)).astype(np.float32)
    coord.bulk_build(list(range(n)), data)
    return coord, data


def test_snapshot_does_not_see_later_mutations(rng):
    coord, data = make_coord(rng)
    snap = coord.snapshot()

    # Mutate the live index: delete a row, insert new ones (re-using the
    # donated-buffer path), vacuum (slot recycling).
    new = rng.standard_normal((30, 16)).astype(np.float32)
    coord.delete([7, 11])
    coord.insert(list(range(1000, 1030)), new)
    coord.vacuum()

    # Live index: deleted rows gone, new rows findable.
    ids_live, _ = coord.search(data[7:8], 3)
    assert 7 not in ids_live[0]
    ids_new, _ = coord.search(new[0:1], 1)
    assert ids_new[0, 0] == 1000

    # Snapshot: sees the deleted row (it existed at snapshot time) and NOT
    # the later inserts — no phantom reads (Proposal:84 "This prevents
    # seeing the future").
    ids_snap, d_snap = snap.search(data[7:8], 3)
    assert ids_snap[0, 0] == 7 and d_snap[0, 0] < 1e-5
    ids_snap2, _ = snap.search(new[0:1], 3)
    assert 1000 not in ids_snap2[0]
    assert snap.count == 120 and coord.count == 148


def test_snapshot_is_read_only(rng):
    coord, data = make_coord(rng, n=40)
    snap = coord.snapshot()
    vec = rng.standard_normal((1, 16)).astype(np.float32)
    with pytest.raises(RuntimeError, match="read-only"):
        snap.insert([999], vec)
    with pytest.raises(RuntimeError, match="read-only"):
        snap.delete([0])
    with pytest.raises(RuntimeError, match="read-only"):
        snap.update(0, vec[0])
    with pytest.raises(RuntimeError, match="read-only"):
        snap.vacuum()


def test_snapshot_equals_live_at_capture_time(rng):
    coord, data = make_coord(rng, n=80)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    want_ids, want_d = coord.search(q, 5)
    snap = coord.snapshot()
    # Heavy churn on the live side.
    coord.delete(list(range(0, 80, 3)))
    coord.insert(
        list(range(2000, 2040)),
        rng.standard_normal((40, 16)).astype(np.float32),
    )
    got_ids, got_d = snap.search(q, 5)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_array_equal(got_d, want_d)
