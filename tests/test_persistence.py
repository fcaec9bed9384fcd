"""Persistence tests: block codec round-trip, native block store, shadow
store, two-phase checkpoint save/load, crash recovery, corruption handling.
"""

import numpy as np
import pytest

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType, VectorType
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.coordinator import Coordinator
from duckdb_lm_diskann_tpu.ops.quantize import encode_int8_np
from duckdb_lm_diskann_tpu.ops.ternary import encode_ternary_np
from duckdb_lm_diskann_tpu.store import block_codec, checkpoint
from duckdb_lm_diskann_tpu.store.file_service import (
    NativeBlockFile,
    PyBlockFile,
    build_native,
    open_block_file,
)
from duckdb_lm_diskann_tpu.store.shadow import (
    PrimaryStorageService,
    ShadowStorageService,
)


def make_config(metric=MetricType.COSINE, edge_type=None, dims=16, r=8):
    cfg = LmDiskannConfig(
        metric_type=metric, r=r, l_insert=max(16, 2 * r), l_search=32,
        dimensions=dims, node_vector_type=VectorType.FLOAT32,
        edge_type=edge_type,
    )
    cfg.validate()
    return cfg


# --------------------------------------------------------------------- #
# block codec


@pytest.mark.parametrize("metric,edge_type", [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT8),
    (MetricType.L2, EdgeType.INT4),
    (MetricType.L2, EdgeType.FLOAT32),
    (MetricType.L2, EdgeType.FLOAT16),
    (MetricType.COSINE, EdgeType.FLOAT1BIT),
])
def test_codec_roundtrip(rng, metric, edge_type):
    cfg = make_config(metric, edge_type)
    n, r, d = 5, cfg.r, cfg.dimensions
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.integers(0, 1000, (n, r)).astype(np.int64)
    ids[:, -2:] = -1  # empty slots
    kw = {}
    nbr_vecs = rng.standard_normal((n, r, d)).astype(np.float32)
    if edge_type is EdgeType.TERNARY:
        kw["edge_pos"], kw["edge_neg"] = encode_ternary_np(nbr_vecs)
    elif edge_type is EdgeType.INT8:
        kw["edge_i8"], kw["edge_scale"] = encode_int8_np(nbr_vecs)
    elif edge_type is EdgeType.INT4:
        from duckdb_lm_diskann_tpu.ops.quantize import encode_int4_np
        kw["edge_i4"], kw["edge_scale"] = encode_int4_np(nbr_vecs)
    elif edge_type is EdgeType.FLOAT16:
        kw["edge_f32"] = nbr_vecs.astype(np.float16)
    elif edge_type is EdgeType.FLOAT1BIT:
        kw["edge_pos"] = encode_ternary_np(nbr_vecs)[0]
    else:
        kw["edge_f32"] = nbr_vecs
    blocks = block_codec.encode_blocks(cfg, vectors, ids, **kw)
    lay = block_codec.resolve_layout(cfg)
    assert blocks.shape == (n, lay.block_size)
    assert lay.block_size % 4096 == 0

    out = block_codec.decode_blocks(cfg, blocks)
    np.testing.assert_array_equal(out["counts"], (ids >= 0).sum(1))
    np.testing.assert_array_equal(out["vectors"], vectors)
    np.testing.assert_array_equal(out["neighbor_rowids"], ids)
    if edge_type is EdgeType.TERNARY:
        np.testing.assert_array_equal(out["edge_pos"], kw["edge_pos"])
        np.testing.assert_array_equal(out["edge_neg"], kw["edge_neg"])
    elif edge_type is EdgeType.INT8:
        np.testing.assert_array_equal(out["edge_i8"], kw["edge_i8"])
        np.testing.assert_array_equal(out["edge_scale"], kw["edge_scale"])
    elif edge_type is EdgeType.INT4:
        np.testing.assert_array_equal(out["edge_i4"], kw["edge_i4"])
        np.testing.assert_array_equal(out["edge_scale"], kw["edge_scale"])
    elif edge_type is EdgeType.FLOAT1BIT:
        np.testing.assert_array_equal(out["edge_pos"], kw["edge_pos"])
    else:
        np.testing.assert_array_equal(out["edge_f32"], kw["edge_f32"])
        assert out["edge_f32"].dtype == (
            np.float16 if edge_type is EdgeType.FLOAT16 else np.float32
        )


def test_codec_reference_layout_positions(rng):
    """Spot-check raw byte positions against the reference layout arithmetic
    (index_config.cpp:104-148) for D=128, R=64 / FLOAT32 / TERNARY."""
    cfg = make_config(MetricType.COSINE, EdgeType.TERNARY, dims=128, r=64)
    vectors = rng.standard_normal((1, 128)).astype(np.float32)
    ids = np.full((1, 64), -1, np.int64)
    ids[0, 0] = 42
    nbr = rng.standard_normal((1, 64, 128)).astype(np.float32)
    pos, neg = encode_ternary_np(nbr)
    blk = block_codec.encode_blocks(cfg, vectors, ids, edge_pos=pos, edge_neg=neg)[0]
    # count @0 (u16) == 1
    assert int(blk[0:2].view(np.uint16)[0]) == 1
    # vector @8
    np.testing.assert_array_equal(blk[8:520].view(np.float32), vectors[0])
    # neighbor ids @520
    assert int(blk[520:528].view(np.int64)[0]) == 42
    # pos planes @1032: first neighbor's plane as u64 == LE pair of u32
    u64_words = blk[1032:1048].copy().view(np.uint64)
    u32_pair = pos[0, 0].view(np.uint32)
    assert int(u64_words[0]) == int(u32_pair[0]) | (int(u32_pair[1]) << 32)
    assert len(blk) == 4096


# --------------------------------------------------------------------- #
# block file (native + python, same on-disk format)


def test_native_builds():
    assert build_native() is not None, "native blockstore failed to compile"


@pytest.mark.parametrize("cls", [NativeBlockFile, PyBlockFile])
def test_block_file_roundtrip(tmp_path, rng, cls):
    path = tmp_path / "graph.lmd"
    bs = 4096
    try:
        f = cls(path, bs)
    except RuntimeError:
        pytest.skip("native unavailable")
    data = rng.integers(0, 256, (6, bs)).astype(np.uint8)
    f.write_blocks(0, data[:4])
    f.write_blocks_at(np.asarray([5, 4]), data[4:6])
    assert f.num_blocks == 6
    np.testing.assert_array_equal(f.read_blocks(0, 4), data[:4])
    np.testing.assert_array_equal(f.read_blocks_at([5, 4]), data[4:6])
    crc = f.crc32_rows(data)
    assert len(crc) == 6 and len(set(crc.tolist())) > 1
    f.sync()
    assert f.file_size() == 4096 + 6 * bs
    f.truncate(3)
    assert f.num_blocks == 3
    f.close()
    # Reopen and verify persistence.
    f2 = cls(path, bs)
    assert f2.num_blocks == 3
    np.testing.assert_array_equal(f2.read_blocks(0, 3), data[:3])
    assert f2.clean_shutdown
    f2.close()


def test_native_and_python_formats_interchange(tmp_path, rng):
    if build_native() is None:
        pytest.skip("native unavailable")
    path = tmp_path / "x.lmd"
    data = rng.integers(0, 256, (3, 4096)).astype(np.uint8)
    nf = NativeBlockFile(path, 4096)
    nf.write_blocks(0, data)
    # CRCs agree between native table CRC and zlib.
    crc_native = nf.crc32_rows(data)
    nf.close()
    pf = PyBlockFile(path, 4096, create=False)
    np.testing.assert_array_equal(pf.read_blocks(0, 3), data)
    np.testing.assert_array_equal(pf.crc32_rows(data), crc_native)
    pf.close()


# --------------------------------------------------------------------- #
# shadow store


def test_shadow_delta_log_and_metadata(tmp_path):
    s = ShadowStorageService(tmp_path)
    s.log_insert_batch([1, 2], [0, 1])
    s.log_delete_batch([1])
    deltas = s.pending_deltas()
    assert [(d[1], d[2]) for d in deltas] == [
        ("insert", 1), ("insert", 2), ("delete", 1)]
    s.set_metadata("entry_rowid", 7)
    assert s.get_metadata("entry_rowid") == 7
    s.commit_checkpoint({2: 1}, [0], np.asarray([11, 22], np.uint32),
                        {"count": 1})
    assert s.pending_deltas() == []
    assert s.load_lookup() == {2: 1}
    assert s.load_tombstones() == [0]
    assert s.load_checksums() == {0: 11, 1: 22}
    assert s.get_metadata("merge_sequence_number") == 1
    s.close()


# --------------------------------------------------------------------- #
# end-to-end checkpoint


@pytest.mark.parametrize("metric,edge_type", [
    (MetricType.COSINE, EdgeType.TERNARY),
    (MetricType.L2, EdgeType.INT8),
    (MetricType.L2, EdgeType.FLOAT16),
    (MetricType.COSINE, EdgeType.FLOAT1BIT),
])
def test_save_load_roundtrip(tmp_path, rng, metric, edge_type):
    cfg = make_config(metric, edge_type)
    coord = Coordinator(cfg, initial_capacity=256)
    n = 80
    data = rng.standard_normal((n, cfg.dimensions)).astype(np.float32)
    rowids = [i * 10 for i in range(n)]  # non-dense rowids
    coord.bulk_build(rowids, data)
    coord.delete([rowids[5], rowids[17]])

    d = tmp_path / "idx"
    checkpoint.save_index(coord, d)
    assert not coord.dirty
    loaded = checkpoint.load_index(d)

    assert loaded.count == coord.count
    assert loaded.entry_rowid == coord.entry_rowid
    assert loaded.allocator.rowid_to_slot == coord.allocator.rowid_to_slot
    assert loaded.allocator.pending_deletion == coord.allocator.pending_deletion
    valid = np.asarray(coord.arrays.valid)[:80]
    np.testing.assert_array_equal(np.asarray(loaded.arrays.valid)[:80], valid)
    # Dead slots serialize zeroed (tombstones keep only their slot); live
    # rows round-trip exactly.
    np.testing.assert_array_equal(
        np.asarray(loaded.arrays.vectors)[:80][valid],
        np.asarray(coord.arrays.vectors)[:80][valid])

    # Search results identical pre/post round-trip.
    q = rng.standard_normal((6, cfg.dimensions)).astype(np.float32)
    ids0, d0 = coord.search(q, 5)
    ids1, d1 = loaded.search(q, 5)
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_array_equal(d0, d1)

    # Continue inserting after reload.
    loaded.insert([99999], rng.standard_normal((1, cfg.dimensions)).astype(np.float32))
    assert loaded.count == coord.count + 1


def test_checksum_corruption_detected(tmp_path, rng):
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((20, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(20)), data)
    d = tmp_path / "idx"
    checkpoint.save_index(coord, d)
    # Flip bytes in one block.
    lay = block_codec.resolve_layout(cfg)
    with open(d / "graph.lmd", "r+b") as f:
        f.seek(4096 + 3 * lay.block_size + 100)
        f.write(b"\xff\xff\xff\xff")
    with pytest.raises(checkpoint.IndexCorruptionError):
        checkpoint.load_index(d)
    # Marked broken now; subsequent loads refuse too.
    with pytest.raises(checkpoint.IndexCorruptionError):
        checkpoint.load_index(d, verify_checksums=False)
    # Last resort: rebuild from the base table.
    primary = PrimaryStorageService.from_array(list(range(20)), data)
    rebuilt = checkpoint.rebuild_from_primary(cfg, primary, list(range(20)), d)
    assert rebuilt.count == 20
    loaded = checkpoint.load_index(d)
    assert loaded.count == 20


def test_crash_recovery_replays_deltas(tmp_path, rng):
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((30, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(20)), data[:20])
    d = tmp_path / "idx"
    checkpoint.save_index(coord, d)

    # Simulate post-checkpoint mutations whose blocks never hit graph.lmd:
    # log deltas in the shadow store only (what the wired shadow service
    # does during normal operation).
    s = ShadowStorageService(d)
    s.log_insert_batch([20, 21], [20, 21])
    s.log_delete_batch([3])
    s.close()

    loaded = checkpoint.load_index(d)
    assert loaded.needs_recovery
    primary = PrimaryStorageService.from_array(list(range(30)), data)
    replayed = checkpoint.recover(loaded, primary, d)
    assert replayed == 3
    assert 20 in loaded.allocator.rowid_to_slot
    assert 21 in loaded.allocator.rowid_to_slot
    assert 3 not in loaded.allocator.rowid_to_slot
    # Recovery checkpointed: a fresh load is clean.
    clean = checkpoint.load_index(d)
    assert not clean.needs_recovery
    assert clean.count == loaded.count


def test_shadow_service_wired_into_coordinator(tmp_path, rng):
    cfg = make_config()
    coord = Coordinator(cfg)
    coord.shadow_service = ShadowStorageService(tmp_path)
    data = rng.standard_normal((5, cfg.dimensions)).astype(np.float32)
    coord.insert(list(range(5)), data)
    coord.delete([2])
    ops = [(d[1], d[2]) for d in coord.shadow_service.pending_deltas()]
    assert ("insert", 0) in ops and ("delete", 2) in ops
    coord.shadow_service.close()


# --------------------------------------------------------------------- #
# incremental checkpoint (V2 dirty-block design, Proposal:96-107,188-211)


def test_incremental_checkpoint_writes_only_dirty(tmp_path, rng):
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((100, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(100)), data)
    d = tmp_path / "idx"
    stats = checkpoint.save_index(coord, d)
    assert not stats["incremental"]
    assert stats["blocks_written"] == 100

    # Small delta: a few inserts + one delete.
    coord.insert([200, 201], rng.standard_normal(
        (2, cfg.dimensions)).astype(np.float32))
    coord.delete([7])
    stats2 = checkpoint.save_index(coord, d)
    assert stats2["incremental"]
    # O(dirty), not O(n): the 2 new rows + delete repair touches, far
    # fewer than a full rewrite.
    assert 0 < stats2["blocks_written"] < 60, stats2

    # Round-trip equality after the incremental save.
    loaded = checkpoint.load_index(d)
    assert loaded.count == coord.count
    q = rng.standard_normal((5, cfg.dimensions)).astype(np.float32)
    ids0, d0 = coord.search(q, 5)
    ids1, d1 = loaded.search(q, 5)
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_array_equal(d0, d1)

    # A no-op save writes nothing.
    stats3 = checkpoint.save_index(coord, d)
    assert stats3["incremental"] and stats3["blocks_written"] == 0


def test_crash_between_checkpoint_phases_recovers(tmp_path, rng, monkeypatch):
    """Phase 1 written + fsynced, crash before phase 2: blocks match their
    STAGED checksums, so the next load must recover (replaying deltas), not
    report corruption; the next save falls back to a full rewrite."""
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((40, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(40)), data)
    d = tmp_path / "idx"
    checkpoint.save_index(coord, d)

    # Wire the shadow service so mutations land in the delta log, mutate,
    # then crash the second (incremental) save right before phase 2.
    coord.shadow_service = ShadowStorageService(d)
    coord.insert([50], rng.standard_normal((1, cfg.dimensions)).astype(np.float32))
    coord.delete([3])

    real_commit = ShadowStorageService.commit_checkpoint

    def crash_commit(self, *a, **k):
        raise RuntimeError("crash before phase 2")

    monkeypatch.setattr(ShadowStorageService, "commit_checkpoint", crash_commit)
    with pytest.raises(RuntimeError, match="crash before phase 2"):
        checkpoint.save_index(coord, d)
    monkeypatch.setattr(ShadowStorageService, "commit_checkpoint", real_commit)

    # Load: no corruption error; pending deltas detected.
    loaded = checkpoint.load_index(d)
    assert loaded.needs_recovery
    primary = PrimaryStorageService.from_array(
        [50], coord.arrays and np.asarray(coord.arrays.vectors[
            coord.allocator.rowid_to_slot[50]])[None, :])
    replayed = checkpoint.recover(loaded, primary, d)
    assert replayed >= 1
    assert 50 in loaded.allocator.rowid_to_slot
    assert 3 not in loaded.allocator.rowid_to_slot
    # Recovery's save was a full rewrite (file was left dirty).
    clean = checkpoint.load_index(d)
    assert not clean.needs_recovery


@pytest.mark.parametrize("cls", [NativeBlockFile, PyBlockFile])
def test_async_flush_engine(tmp_path, rng, cls):
    """Background writer thread (the V2 flush-daemon design, Consolidated
    Proposal:96-107): submission order preserved, fsync barrier drains,
    close drains, contents identical to synchronous writes."""
    path = tmp_path / "graph.lmd"
    bs = 512
    try:
        f = cls(path, bs)
    except RuntimeError:
        pytest.skip("native unavailable")
    a = rng.integers(0, 256, (100, bs)).astype(np.uint8)
    b = rng.integers(0, 256, (50, bs)).astype(np.uint8)
    c = rng.integers(0, 256, (100, bs)).astype(np.uint8)
    f.submit_write(0, a)
    f.submit_write_at(np.arange(100, 150, dtype=np.uint64), b)
    # Later job overwrites an earlier range -> order matters.
    f.submit_write(0, c)
    job = f.submit_sync()
    f.flush_wait(job)
    assert f.async_pending() == 0
    got = f.read_blocks(0, 150)
    np.testing.assert_array_equal(got[:100], c)
    np.testing.assert_array_equal(got[100:], b)
    # close() drains outstanding jobs.
    f.submit_write(150, a)
    f.close()
    f2 = cls(path, bs)
    np.testing.assert_array_equal(f2.read_blocks(150, 100), a)
    assert f2.num_blocks == 250
    f2.close()


def test_checkpoint_multi_chunk_pipeline(tmp_path, rng):
    """save_index with a tiny chunk budget -> many pipelined async chunks;
    full and incremental saves both round-trip identically."""
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((120, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(120)), data)
    d = tmp_path / "idx"
    stats = checkpoint.save_index(coord, d, chunk_bytes=1)  # 1 block/chunk
    assert not stats["incremental"] and stats["blocks_written"] == 120
    loaded = checkpoint.load_index(d)
    q = rng.standard_normal((4, cfg.dimensions)).astype(np.float32)
    np.testing.assert_array_equal(
        coord.search(q, 5)[0], loaded.search(q, 5)[0])

    coord.insert(
        [300], rng.standard_normal((1, cfg.dimensions)).astype(np.float32))
    stats2 = checkpoint.save_index(coord, d, chunk_bytes=1)
    assert stats2["incremental"] and stats2["blocks_written"] > 0
    loaded2 = checkpoint.load_index(d)
    np.testing.assert_array_equal(
        coord.search(q, 5)[0], loaded2.search(q, 5)[0])


def test_async_flush_fail_stop(tmp_path, rng, monkeypatch):
    """First async-write failure is sticky: flush_wait raises, later jobs
    are skipped (fail-stop), and close() still drains without raising."""
    bs = 256
    f = PyBlockFile(tmp_path / "g.lmd", bs)
    a = rng.integers(0, 256, (4, bs)).astype(np.uint8)

    real_write = PyBlockFile.write_blocks
    calls = {"n": 0}

    def flaky(self, first, blocks):
        calls["n"] += 1
        if calls["n"] == 2:
            raise IOError("disk gone")
        return real_write(self, first, blocks)

    monkeypatch.setattr(PyBlockFile, "write_blocks", flaky)
    f.submit_write(0, a)       # ok
    f.submit_write(4, a)       # fails
    j3 = f.submit_write(8, a)  # skipped (fail-stop)
    with pytest.raises(IOError, match="disk gone"):
        f.flush_wait(j3)
    monkeypatch.undo()
    f.close()  # drains, never raises
    f2 = PyBlockFile(tmp_path / "g.lmd", bs)
    np.testing.assert_array_equal(f2.read_blocks(0, 4), a)
    assert f2.num_blocks == 4  # job 2 failed, job 3 skipped
    f2.close()


# --------------------------------------------------------------------- #
# systematic crash-point fault injection (the harness the reference's V2
# design calls for but never built — SURVEY §5 "No fault-injection harness
# exists"; recovery protocol at Consolidated Proposal:190-209)


class _CrashPoint(Exception):
    pass


class _FaultyBlockFile:
    """Wraps a block file; raises _CrashPoint once the mutation budget is
    spent — simulating process death at an arbitrary write-op boundary."""

    MUTATORS = {"write_blocks", "write_blocks_at", "truncate", "mark_dirty",
                "submit_write", "submit_write_at"}

    def __init__(self, inner, budget_box):
        self._inner = inner
        self._box = budget_box

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if name in self.MUTATORS:
            def guarded(*a, **k):
                if self._box[0] <= 0:
                    raise _CrashPoint(name)
                self._box[0] -= 1
                return attr(*a, **k)
            return guarded
        return attr


def test_crash_at_every_write_boundary_recovers(tmp_path, rng, monkeypatch):
    """Sweep ALL write-op boundaries of an incremental checkpoint: a crash
    at any of them must leave a loadable index (no corruption report — every
    block matches its committed or staged CRC) whose recovery replays the
    delta log to the exact expected membership."""
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((40, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(40)), data)
    d0 = tmp_path / "idx"
    checkpoint.save_index(coord, d0)

    coord.shadow_service = ShadowStorageService(d0)
    new_vec = rng.standard_normal((1, cfg.dimensions)).astype(np.float32)
    coord.insert([50], new_vec)
    coord.delete([3])
    coord.shadow_service.close()
    coord.shadow_service = None

    import shutil

    real_open = checkpoint.open_block_file
    box = [0]

    def faulty_open(*a, **k):
        return _FaultyBlockFile(real_open(*a, **k), box)

    want_rowids = (set(range(40)) - {3}) | {50}
    crashed_at = 0
    for budget in range(0, 64):
        dn = tmp_path / f"idx_b{budget}"
        shutil.copytree(d0, dn)
        box[0] = budget
        monkeypatch.setattr(checkpoint, "open_block_file", faulty_open)
        try:
            checkpoint.save_index(coord, dn)
            survived = True
        except _CrashPoint:
            survived = False
            crashed_at = budget
        finally:
            monkeypatch.setattr(checkpoint, "open_block_file", real_open)

        # Loads cleanly at EVERY crash point (never a corruption report).
        loaded = checkpoint.load_index(dn)
        if survived:
            assert not loaded.needs_recovery
            assert set(loaded.allocator.rowid_to_slot) == want_rowids
            break
        if loaded.needs_recovery:
            # Crash before phase-2 commit: replay the delta log.
            primary = PrimaryStorageService.from_array([50], new_vec)
            assert checkpoint.recover(loaded, primary, dn) >= 1
            assert set(loaded.allocator.rowid_to_slot) == want_rowids
            clean = checkpoint.load_index(dn)
            assert not clean.needs_recovery
        else:
            # Crash between phase-2 commit and the clean-shutdown mark:
            # the checkpoint is already durable, nothing to replay.
            clean = loaded
        assert set(clean.allocator.rowid_to_slot) == want_rowids
        ids, _ = clean.search(data[7:8], 1)
        assert int(np.asarray(ids).ravel()[0]) == 7
    else:
        pytest.fail("fault budget never let the checkpoint complete")
    assert crashed_at >= 2  # the sweep actually exercised multiple points


def test_torn_block_write_detected_as_corruption(tmp_path, rng):
    """A block torn MID-write (matches neither committed nor staged CRC)
    must surface as IndexCorruptionError + broken flag — the mark-broken /
    rebuild-from-base-table last resort (Proposal:429,440)."""
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((30, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(30)), data)
    d = tmp_path / "idx"
    checkpoint.save_index(coord, d)

    layout = block_codec.resolve_layout(cfg)
    with open(d / "graph.lmd", "r+b") as f:
        # Header is 4096 B; tear the middle of block 5.
        f.seek(4096 + 5 * layout.block_size + layout.block_size // 2)
        f.write(b"\xa5" * 64)
    with pytest.raises(checkpoint.IndexCorruptionError, match="block"):
        checkpoint.load_index(d)
    # Marked broken: even a pristine re-read now refuses fast.
    with pytest.raises(checkpoint.IndexCorruptionError, match="broken"):
        checkpoint.load_index(d)
    # Last resort: rebuild from the base table.
    rebuilt = checkpoint.rebuild_from_primary(
        cfg, PrimaryStorageService.from_array(list(range(30)), data),
        list(range(30)), d,
    )
    assert rebuilt.count == 30
    clean = checkpoint.load_index(d)
    ids, _ = clean.search(data[11:12], 1)
    assert int(np.asarray(ids).ravel()[0]) == 11


def test_recovery_replays_large_backlog_in_batches(tmp_path, rng):
    """Crash-replay of a big un-checkpointed delta backlog must be BATCHED
    (one ramped bulk insert per run), not one device dispatch per row —
    the difference between seconds and hours at a 100k backlog
    (docs/DURABILITY.md). Correctness: interleaved insert/delete runs
    replay in sequence order; duplicates are idempotent."""
    cfg = make_config()
    coord = Coordinator(cfg)
    data = rng.standard_normal((600, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(100)), data[:100])
    d = tmp_path / "idx"
    checkpoint.save_index(coord, d)

    s = ShadowStorageService(d)
    s.log_insert_batch(list(range(100, 500)), list(range(100, 500)))
    s.log_delete_batch([7, 9])
    s.log_insert_batch([500, 501, 500], [500, 501, 500])  # dup entry
    s.log_delete_batch([500])  # delete a row inserted earlier in the log
    s.close()

    loaded = checkpoint.load_index(d)
    assert loaded.needs_recovery
    primary = PrimaryStorageService.from_array(list(range(600)), data)

    calls = {"insert": 0, "delete": 0}
    orig_insert, orig_delete = loaded.insert, loaded.delete

    def spy_insert(rowids, vectors):
        calls["insert"] += 1
        return orig_insert(rowids, vectors)

    def spy_delete(rowids):
        calls["delete"] += 1
        return orig_delete(rowids)

    loaded.insert, loaded.delete = spy_insert, spy_delete
    replayed = checkpoint.recover(loaded, primary, d)
    # 400 + 2 + 2 (dup collapsed) + 1
    assert replayed == 405
    # batched: one call per RUN of the log, not per row
    assert calls["insert"] == 2
    assert calls["delete"] == 2
    assert 499 in loaded.allocator.rowid_to_slot
    assert 501 in loaded.allocator.rowid_to_slot
    assert 500 not in loaded.allocator.rowid_to_slot
    assert 7 not in loaded.allocator.rowid_to_slot
    clean = checkpoint.load_index(d)
    assert not clean.needs_recovery
    assert clean.count == 100 + 400 + 1 - 2


def test_pending_delta_backlog_triggers_checkpoint(tmp_path, rng):
    """The adapter bounds the crash-replay backlog: DML past the
    lm_diskann_checkpoint_pending_deltas option checkpoints inline,
    clearing the delta log."""
    from duckdb_lm_diskann_tpu.db.database import connect

    db = connect(str(tmp_path / "db"))
    data = rng.standard_normal((32, 8)).astype(np.float32)
    t = db.create_table("t", {"v": data})
    db.create_index(
        "idx", t, "v",
        options={"metric": "l2", "r": 4, "l_insert": 8, "l_search": 16},
    )
    db.set_option("lm_diskann_checkpoint_pending_deltas", 10)
    bidx = t.indexes["idx"].index
    shadow = bidx.coordinator.shadow_service
    t.insert({"v": rng.standard_normal((4, 8)).astype(np.float32)})
    assert shadow.pending_count() <= 10  # below the bound: may accumulate
    t.insert({"v": rng.standard_normal((12, 8)).astype(np.float32)})
    # backlog crossed the bound -> checkpoint fired -> log cleared
    assert shadow.pending_count() == 0
    # and disabling the trigger lets the backlog grow
    db.set_option("lm_diskann_checkpoint_pending_deltas", 0)
    t.insert({"v": rng.standard_normal((12, 8)).astype(np.float32)})
    assert shadow.pending_count() == 12


def test_recover_replays_crash_logged_update(tmp_path, rng):
    """Regression (round-4 review): a crash log containing an UPDATE
    (delete r, insert r) must re-apply the insert — the old replay skipped
    it because the row still resolved while its delete sat un-flushed in
    the current run, permanently dropping the row."""
    d = tmp_path / "idx"
    cfg = make_config(metric=MetricType.L2)
    coord = Coordinator(cfg)
    data = rng.standard_normal((40, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(40)), data)
    checkpoint.save_index(coord, d)

    loaded = checkpoint.load_index(d)
    new_vec = rng.standard_normal(cfg.dimensions).astype(np.float32) + 25.0
    loaded.pending_deltas = [
        (0, "delete", 3, None),
        (1, "insert", 3, None),
    ]
    loaded.needs_recovery = True

    class Primary:
        def get_vectors(self, rows):
            assert list(rows) == [3]
            return new_vec[None, :]

    assert checkpoint.recover(loaded, Primary(), d) == 2
    assert 3 in loaded.allocator.rowid_to_slot
    ids, _ = loaded.search(new_vec[None, :], 1, l_search=64)
    assert ids[0, 0] == 3
    # the post-recovery checkpoint reloads with the updated vector
    again = checkpoint.load_index(d)
    ids2, _ = again.search(new_vec[None, :], 1, l_search=64)
    assert ids2[0, 0] == 3


def test_load_after_delete_all(tmp_path, rng):
    """Regression (round-4 review): a checkpoint whose every row was
    deleted (high_water > 0, empty lookup) must load, not IndexError in
    the neighbor-rowid translation."""
    d = tmp_path / "idx"
    cfg = make_config(metric=MetricType.L2)
    coord = Coordinator(cfg)
    data = rng.standard_normal((12, cfg.dimensions)).astype(np.float32)
    coord.bulk_build(list(range(12)), data)
    coord.delete(list(range(12)))
    checkpoint.save_index(coord, d)

    loaded = checkpoint.load_index(d)
    assert loaded.count == 0
    ids, _ = loaded.search(data[:2], 3, l_search=32)
    assert (ids == -1).all()
    loaded.insert([100], data[:1])  # the empty index is still usable
    ids2, _ = loaded.search(data[:1], 1, l_search=32)
    assert ids2[0, 0] == 100
