"""Planner/DB-surface tests: optimizer rewrites, index-vs-brute-force
agreement, scan draining, pragmas, macros, settings, persistence-on-
checkpoint — the behavior of the reference's src/hnsw planner module.
"""

import numpy as np
import pytest

from duckdb_lm_diskann_tpu.common.types import MetricType
from duckdb_lm_diskann_tpu.db import planner, settings
from duckdb_lm_diskann_tpu.db.database import connect
from duckdb_lm_diskann_tpu.db.functions import (
    ColumnRef,
    Const,
    cosine_similarity,
    sub,
)
from duckdb_lm_diskann_tpu.db.planner import (
    LogicalGet,
    LogicalIndexScan,
    LogicalProjection,
    LogicalTopKAgg,
    LogicalTopN,
    rewrite_expr,
)

from tests.test_build import clustered_data


@pytest.fixture
def db_and_table(rng):
    db = connect()
    data = clustered_data(rng, 500, 24, n_clusters=20)
    t = db.create_table("items", {
        "vec": data,
        "label": np.arange(500) % 7,
    })
    return db, t, data


def test_expr_rewrite_similarity_to_distance():
    a, b = ColumnRef("vec"), Const(np.zeros(4, np.float32))
    e = sub(Const(1.0), cosine_similarity(a, b))
    out = rewrite_expr(e)
    assert out.name == "array_cosine_distance"
    assert out.args == (a, b)
    # Non-matching exprs untouched.
    e2 = sub(Const(2.0), cosine_similarity(a, b))
    assert rewrite_expr(e2).name == "-"


def test_topn_rewrites_to_index_scan(db_and_table, rng):
    db, t, data = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32, "l_search": 64})
    q = data[3] + 0.01
    res, plan = db.knn(t, "vec", q, 10, metric="l2", return_plan=True)
    assert isinstance(plan, LogicalIndexScan)
    assert len(res["row_ids"]) == 10
    # Agreement with the brute-force macro (high-recall setting).
    brute = db.lm_diskann_match(t, "vec", q, 10, metric="l2")
    overlap = len(set(res["row_ids"].tolist()) & set(brute["row_ids"].tolist()))
    assert overlap >= 8


def test_topn_without_index_stays_brute_force(db_and_table):
    db, t, data = db_and_table
    res, plan = db.knn(t, "vec", data[0], 5, metric="cosine", return_plan=True)
    assert isinstance(plan, LogicalTopN)  # no rewrite
    assert len(res["row_ids"]) == 5
    assert res["row_ids"][0] == 0  # the query point itself


def test_metric_mismatch_prevents_rewrite(db_and_table):
    db, t, data = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32})
    # cosine query over an l2 index must NOT use the index
    _, plan = db.knn(t, "vec", data[0], 5, metric="cosine", return_plan=True)
    assert isinstance(plan, LogicalTopN)


def test_residual_filter_pulled_up(db_and_table):
    db, t, data = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32, "l_search": 64})

    def only_label_zero(table, rowids):
        return table.fetch(rowids, "label") == 0

    res, plan = db.knn(t, "vec", data[0], 10, metric="l2",
                       filter=only_label_zero, return_plan=True)
    assert isinstance(plan, LogicalIndexScan)
    labels = t.fetch(res["row_ids"], "label")
    assert (labels == 0).all()
    # Reduced-row-count caveat: may return fewer than k (reference behavior).
    assert len(res["row_ids"]) <= 10


def test_topk_min_by_rewrite(db_and_table):
    db, t, data = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32, "l_search": 64})
    from duckdb_lm_diskann_tpu.db.functions import l2 as l2fn

    agg = LogicalTopKAgg(
        LogicalGet(t), "label",
        l2fn(ColumnRef("vec"), Const(data[5])), 7,
    )
    optimized = planner.optimize(agg)
    assert isinstance(optimized, LogicalProjection)
    assert isinstance(optimized.child, LogicalIndexScan)
    res = planner.execute(optimized)
    assert len(res["row_ids"]) == 7
    assert "label" in res
    assert res["row_ids"][0] == 5


def test_knn_join_batched(db_and_table, rng):
    db, t, data = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32, "l_search": 64})
    queries = data[[2, 9, 33]] + 0.01
    res = db.knn_join(t, "vec", queries, 4)
    assert res["row_ids"].shape == (12,)
    np.testing.assert_array_equal(res["rank"], np.tile([1, 2, 3, 4], 3))
    np.testing.assert_array_equal(res["query_index"], np.repeat([0, 1, 2], 4))
    # Ranks are 1-indexed nearest-first.
    assert res["row_ids"][0] == 2 and res["row_ids"][4] == 9

    # Without an index: brute-force macro fallback, same shape.
    db2 = connect()
    t2 = db2.create_table("x", {"vec": data})
    res2 = db2.knn_join(t2, "vec", queries, 4)
    assert res2["row_ids"].shape == (12,)
    assert res2["row_ids"][0] == 2


def test_scan_state_drains_in_chunks(db_and_table):
    db, t, data = db_and_table
    idx = db.create_index("idx", t, "vec", options={
        "metric": "l2", "r": 16, "l_insert": 32, "l_search": 64})
    state = idx.initialize_scan(data[0], 10)
    a = idx.scan(state, max_rows=4)
    b = idx.scan(state, max_rows=4)
    c = idx.scan(state, max_rows=4)
    assert len(a) == 4 and len(b) == 4 and len(c) == 2
    assert state.exhausted
    assert len(set(np.concatenate([a, b, c]).tolist())) == 10


def test_dml_maintains_index(db_and_table, rng):
    db, t, data = db_and_table
    idx = db.create_index("idx", t, "vec", options={
        "metric": "l2", "r": 16, "l_insert": 32, "l_search": 64})
    v = data[42] + 0.001
    new_ids = t.insert({"vec": v[None, :], "label": np.asarray([3])})
    assert idx.coordinator.count == 501
    res = db.knn(t, "vec", v, 1, metric="l2")
    assert res["row_ids"][0] == new_ids[0]
    t.delete(new_ids.tolist())
    assert idx.coordinator.count == 500
    res = db.knn(t, "vec", v, 1, metric="l2")
    assert res["row_ids"][0] != new_ids[0]


def test_pragma_index_info_and_compact(db_and_table):
    db, t, _ = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32})
    t.delete([1, 2])
    info = db.pragma_lm_diskann_index_info()
    assert len(info) == 1
    row = info[0]
    assert row["index_name"] == "idx" and row["metric"] == "l2"
    assert row["dimensions"] == 24 and row["count"] == 498
    assert row["pending_deletes"] == 2
    assert db.lm_diskann_compact_index("idx") == 2
    assert db.pragma_lm_diskann_index_info()[0]["pending_deletes"] == 0
    with pytest.raises(KeyError):
        db.lm_diskann_compact_index("nope")


def test_session_setting_overrides_l_search(db_and_table):
    db, t, data = db_and_table
    idx = db.create_index("idx", t, "vec", options={
        "metric": "l2", "r": 16, "l_insert": 32, "l_search": 33})
    idx.search(data[:1], 5)
    assert idx.coordinator.last_search_stats.l_search == 33
    db.set_option("lm_diskann_l_search", 77)
    try:
        idx.search(data[:1], 5)
        assert idx.coordinator.last_search_stats.l_search == 77
    finally:
        db.set_option("lm_diskann_l_search", 0)
    with pytest.raises(KeyError):
        db.set_option("bogus_setting", 1)


def test_session_settings_are_per_connection():
    """Two Databases in one process must not share option overrides
    (the reference's options are per-ClientContext)."""
    from duckdb_lm_diskann_tpu.db.database import connect

    db1, db2 = connect(), connect()
    db1.set_option("lm_diskann_l_search", 123)
    assert db1.get_option("lm_diskann_l_search") == 123
    assert db2.get_option("lm_diskann_l_search") == 0
    assert settings.get_option("lm_diskann_l_search") == 0


def test_create_index_skips_nan_rows(rng):
    db = connect()
    data = clustered_data(rng, 50, 8)
    data[7] = np.nan
    t = db.create_table("x", {"vec": data})
    idx = db.create_index("i", t, "vec", options={"metric": "l2", "r": 8,
                                                  "l_insert": 16})
    assert idx.coordinator.count == 49
    assert 7 not in idx.coordinator.allocator.rowid_to_slot


def test_checkpoint_and_reload(tmp_path, rng):
    data = clustered_data(rng, 100, 8)
    db = connect(str(tmp_path / "mydb"))
    t = db.create_table("x", {"vec": data})
    db.create_index("i", t, "vec", options={"metric": "l2", "r": 8,
                                            "l_insert": 16})
    db.checkpoint()
    # New session: index reloads from <db>.lmd_idx/i/.
    db2 = connect(str(tmp_path / "mydb"))
    t2 = db2.create_table("x", {"vec": data})
    from duckdb_lm_diskann_tpu.db.index import LmDiskannIndex
    idx2 = LmDiskannIndex("i", data.dtype, 8,
                          options={"metric": "l2", "r": 8, "l_insert": 16},
                          db_path=db2.path)
    assert idx2.coordinator.count == 100
    ids, _ = idx2.search(data[:2], 3)
    assert (ids[:, 0] == [0, 1]).all()


def test_verify_and_to_string(db_and_table):
    db, t, _ = db_and_table
    idx = db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                                    "l_insert": 32})
    s = idx.verify_and_to_string()
    assert "count=500" in s and "metric=l2" in s
    idx.verify_and_to_string(only_verify=True)


def test_drop_index(tmp_path, rng):
    data = clustered_data(rng, 30, 8)
    db = connect(str(tmp_path / "db"))
    t = db.create_table("x", {"vec": data})
    idx = db.create_index("i", t, "vec", options={"metric": "l2", "r": 8,
                                                  "l_insert": 16})
    d = idx.directory
    db.checkpoint()
    assert d.exists()
    db.drop_index(t, "i")
    assert not d.exists()
    assert "i" not in t.indexes


class TestJoinOptimizer:
    """The lateral top-k join matcher (hnsw_optimize_join.cpp:352-480)."""

    def _make_db(self, rng, with_index=True):
        import numpy as np

        from duckdb_lm_diskann_tpu.db.database import connect

        data = rng.standard_normal((120, 12)).astype(np.float32)
        db = connect()
        t = db.create_table("base", {"vec": data})
        if with_index:
            db.create_index(
                "v", t, "vec",
                options={"metric": "l2", "r": 8, "l_insert": 16,
                         "l_search": 200},
            )
        return db, t, data

    def test_lateral_plan_rewrites_to_knn_join(self, rng):
        import numpy as np

        from duckdb_lm_diskann_tpu.db import planner

        db, t, data = self._make_db(rng)
        q = rng.standard_normal((5, 12)).astype(np.float32)
        res, plan = db.knn_join(t, "vec", q, 3, return_plan=True)
        assert isinstance(plan, planner.LogicalKnnJoin)
        assert plan.k == 3
        # identical results to the brute-force lateral execution
        db2, t2, _ = self._make_db(rng, with_index=False)
        t2.columns["vec"] = data  # same corpus
        brute, plan2 = db2.knn_join(t2, "vec", q, 3, return_plan=True)
        assert isinstance(plan2, planner.LogicalExprFilter)  # no rewrite
        np.testing.assert_array_equal(res["row_ids"], brute["row_ids"])
        np.testing.assert_array_equal(res["rank"], brute["rank"])
        np.testing.assert_array_equal(res["query_index"], brute["query_index"])
        np.testing.assert_allclose(
            res["distance"], brute["distance"], rtol=1e-5, atol=1e-5
        )
        assert list(res["rank"][:3]) == [1, 2, 3]

    def test_matcher_bails_on_wrong_shapes(self, rng):
        import numpy as np

        from duckdb_lm_diskann_tpu.db import planner
        from duckdb_lm_diskann_tpu.db.database import Table
        from duckdb_lm_diskann_tpu.db.functions import (
            ColumnRef, Const, FunctionExpr,
        )

        db, t, _ = self._make_db(rng)
        qt = Table("qs", {"q": rng.standard_normal((4, 12)).astype(np.float32)})

        def lateral(order_expr, pred, ascending=True):
            return planner.LogicalExprFilter(
                planner.LogicalWindow(
                    planner.LogicalCrossProduct(
                        planner.LogicalGet(qt), planner.LogicalGet(t)
                    ),
                    function="row_number",
                    partition="__left_row__",
                    order_expr=order_expr,
                    ascending=ascending,
                ),
                pred,
            )

        good_order = FunctionExpr(
            "array_distance",
            (ColumnRef("q", table="qs"), ColumnRef("vec", table="base")),
        )
        good_pred = FunctionExpr("<=", (ColumnRef("row_number"), Const(3)))
        assert isinstance(
            planner.optimize(lateral(good_order, good_pred)),
            planner.LogicalKnnJoin,
        )
        # reversed comparison also matches: 3 >= row_number
        rev_pred = FunctionExpr(">=", (Const(3), ColumnRef("row_number")))
        assert isinstance(
            planner.optimize(lateral(good_order, rev_pred)),
            planner.LogicalKnnJoin,
        )
        # metric mismatch (cosine expr, l2 index) -> no rewrite
        cos_order = FunctionExpr(
            "array_cosine_distance",
            (ColumnRef("q", table="qs"), ColumnRef("vec", table="base")),
        )
        assert isinstance(
            planner.optimize(lateral(cos_order, good_pred)),
            planner.LogicalExprFilter,
        )
        # descending order -> no rewrite
        assert isinstance(
            planner.optimize(lateral(good_order, good_pred, ascending=False)),
            planner.LogicalExprFilter,
        )
        # rank predicate on the wrong column -> no rewrite
        bad_pred = FunctionExpr("<=", (ColumnRef("other"), Const(3)))
        assert isinstance(
            planner.optimize(lateral(good_order, bad_pred)),
            planner.LogicalExprFilter,
        )


def test_vector_top_k_by_index_name(rng):
    """libSQL's vector_top_k virtual table analog: top-k addressed by
    index name, using the index's own metric (vectorIndexInt.h:228-236)."""
    from duckdb_lm_diskann_tpu.db.database import connect

    data = rng.standard_normal((150, 8)).astype(np.float32)
    db = connect()
    t = db.create_table("x", {"vec": data})
    db.create_index(
        "byname", t, "vec",
        options={"metric": "l2", "r": 8, "l_insert": 16, "l_search": 128},
    )
    res = db.vector_top_k("byname", data[17] + 0.001, 5)
    assert 17 in res["row_ids"].tolist()
    assert len(res["row_ids"]) == 5
    import pytest as _pytest

    with _pytest.raises(KeyError):
        db.vector_top_k("nope", data[0], 3)


def test_merge_projections_collapses_nested(db_and_table):
    """MergeProjections analog (hnsw_optimize_scan.cpp:202-250): the TopN
    rewrite over an already-projected plan must leave ONE projection node
    (outer column set) over the index scan, not a projection chain that
    materializes discarded columns."""
    db, t, data = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32, "l_search": 64})
    from duckdb_lm_diskann_tpu.db.functions import l2 as l2fn
    from duckdb_lm_diskann_tpu.db.planner import (
        Const,
        LogicalGet,
        LogicalTopN,
        execute,
        optimize,
    )

    inner = LogicalProjection(LogicalGet(t), ["vec", "label"])
    outer = LogicalProjection(inner, ["label"])
    plan = LogicalTopN(
        child=LogicalProjection(outer, ["label"]),
        order_expr=l2fn(planner.ColumnRef("vec", t.name), Const(data[2])),
        limit=5,
    )
    optimized = optimize(plan)
    # one merged projection over the rewritten scan
    assert isinstance(optimized, LogicalProjection)
    assert optimized.columns == ["label"]
    assert isinstance(optimized.child, LogicalIndexScan)
    res = execute(optimized)
    res.pop("_table", None)
    assert set(res) == {"row_ids", "distance", "label"}
    assert res["row_ids"][0] == 2


def test_adaptive_seeds_session_setting(db_and_table):
    """The lm_diskann_adaptive_seeds session option routes scans through
    query-adaptive seeding (searcher.pick_adaptive_seeds); results remain
    exact self-matches and the option is per-connection like the other
    settings tiers."""
    db, t, data = db_and_table
    db.create_index("idx", t, "vec", options={"metric": "l2", "r": 16,
                                              "l_insert": 32, "l_search": 64})
    db.set_option("lm_diskann_adaptive_seeds", 2)
    try:
        res = db.knn(t, "vec", data[11], 3, metric="l2")
        assert res["row_ids"][0] == 11
    finally:
        db.set_option("lm_diskann_adaptive_seeds", 0)
