"""Real INT8 node-vector path (ARRAY(TINYINT, N) columns).

The reference accepts int8 columns but stores a placeholder cast
(GraphManager.cpp:98-107, flagged in SURVEY Appendix B); here INT8 node
vectors are device-resident int8 (4x less HBM + visit-gather bandwidth)
widened to f32 in-register at distance time — the semantics of
CalculateDistance<float,int8> (distance.hpp:165-198) done for real.
"""

import numpy as np
import jax.numpy as jnp

from duckdb_lm_diskann_tpu.common.types import (
    EdgeType,
    MetricType,
    VectorType,
)
from duckdb_lm_diskann_tpu.core.config import LmDiskannConfig
from duckdb_lm_diskann_tpu.core.coordinator import Coordinator


def _int8_data(rng, n, d):
    return rng.integers(-128, 128, (n, d)).astype(np.int8)


def _make(metric, edge, dims, vtype):
    cfg = LmDiskannConfig(
        metric_type=metric, r=8, l_insert=16, l_search=64,
        dimensions=dims, node_vector_type=vtype, edge_type=edge,
    )
    cfg.validate()
    return Coordinator(cfg, initial_capacity=256)


def test_int8_storage_dtype_and_search_parity(rng):
    """An INT8 index stores int8 on device and returns exactly the results
    of a FLOAT32 index over the same (integral) data."""
    n, d = 200, 16
    data = _int8_data(rng, n, d)
    for metric, edge in [
        (MetricType.L2, EdgeType.INT8),
        (MetricType.COSINE, EdgeType.TERNARY),
    ]:
        c8 = _make(metric, edge, d, VectorType.INT8)
        cf = _make(metric, edge, d, VectorType.FLOAT32)
        c8.bulk_build(list(range(n)), data.astype(np.float32))
        cf.bulk_build(list(range(n)), data.astype(np.float32))
        assert c8.arrays.vectors.dtype == jnp.int8
        assert cf.arrays.vectors.dtype == jnp.float32
        # int8 vectors array is 4x smaller in HBM
        assert (
            c8.arrays.vectors.size * c8.arrays.vectors.dtype.itemsize
            == cf.arrays.vectors.size * 4 // 4
        )
        q = data[rng.integers(0, n, 8)].astype(np.float32)
        ids8, d8 = c8.search(q, 5)
        idsf, df = cf.search(q, 5)
        np.testing.assert_array_equal(ids8, idsf)
        np.testing.assert_allclose(d8, df, rtol=1e-6, atol=1e-6)


def test_int8_quantization_round_clamp(rng):
    """Float input to an INT8 index is quantized round-half-even + clamped;
    searches then see the stored values."""
    d = 8
    c = _make(MetricType.L2, EdgeType.INT8, d, VectorType.INT8)
    vec = np.full((1, d), 200.7, np.float32)  # clamps to 127
    c.insert([0], vec)
    stored = np.asarray(c.arrays.vectors[0])
    assert stored.dtype == np.int8
    np.testing.assert_array_equal(stored, np.full(d, 127, np.int8))


def test_int8_column_end_to_end_db(tmp_path, rng):
    """TINYINT column through the full db surface: derive INT8 from the
    column dtype, index DML, persistence round-trip preserving the int8
    storage dtype and results."""
    from duckdb_lm_diskann_tpu.db.database import connect

    n, d = 150, 12
    data = _int8_data(rng, n, d)
    db = connect(str(tmp_path / "db"))
    t = db.create_table("x", {"vec": data})
    db.create_index(
        "v", t, "vec",
        options={"metric": "l2", "r": 8, "l_insert": 16, "l_search": 200},
    )
    idx = t.indexes["v"].index
    assert idx.config.node_vector_type is VectorType.INT8
    assert idx.coordinator.arrays.vectors.dtype == jnp.int8

    for i in range(5):  # self-match first (knn is the single-query TopN)
        res = db.knn(t, "vec", data[i].astype(np.float32), 3, metric="l2")
        assert int(np.asarray(res["row_ids"])[0]) == i

    # DML: insert + delete maintain the int8 index live.
    new = _int8_data(rng, 2, d)
    new_ids = t.insert({"vec": new})
    res2 = db.knn(t, "vec", new[0].astype(np.float32), 1, metric="l2")
    assert int(np.asarray(res2["row_ids"])[0]) == int(new_ids[0])
    t.delete([int(new_ids[0])])
    res3 = db.knn(t, "vec", new[0].astype(np.float32), 3, metric="l2")
    assert int(new_ids[0]) not in np.asarray(res3["row_ids"]).tolist()

    # Persistence round-trip: checkpoint, reopen, identical results + dtype.
    db.checkpoint()
    db2 = connect(str(tmp_path / "db"))
    t2 = db2.create_table("x", {"vec": t.columns["vec"]})
    t2.row_ids = t.row_ids.copy()
    t2._rowid_to_pos = dict(t._rowid_to_pos)
    t2._next_rowid = t._next_rowid
    db2.create_index(
        "v", t2, "vec",
        options={"metric": "l2", "r": 8, "l_insert": 16, "l_search": 200},
    )
    idx2 = t2.indexes["v"].index
    assert idx2.coordinator.arrays.vectors.dtype == jnp.int8
    for i in range(5):
        q = data[i].astype(np.float32)
        a = db.knn(t, "vec", q, 3, metric="l2")
        b = db2.knn(t2, "vec", q, 3, metric="l2")
        np.testing.assert_array_equal(a["row_ids"], b["row_ids"])
        np.testing.assert_allclose(
            a["distance"], b["distance"], rtol=1e-6, atol=1e-6
        )
