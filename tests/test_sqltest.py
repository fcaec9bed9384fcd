"""SQL-logic-test harness tests (reference test/sql format, SURVEY §4)."""

from pathlib import Path

import numpy as np
import pytest

from duckdb_lm_diskann_tpu.db.sqltest import (
    MiniSql,
    SqlTestError,
    run_sqllogic_file,
)

SQL_DIR = Path(__file__).parent / "sql"


ALL_SQL_FILES = sorted(SQL_DIR.glob("*.sql.test"))


@pytest.mark.parametrize(
    "path", ALL_SQL_FILES, ids=[p.name.split(".")[0] for p in ALL_SQL_FILES]
)
def test_sqllogic_file(path):
    """Replay every reference-format sqllogictest file: the rewrite edge
    cases (filters above/below, similarity forms, join rank semantics) the
    duckdb-vss suite covers live here as SQL, not just Python unit tests."""
    n = run_sqllogic_file(path)
    assert n >= 4


def test_sql_replay_set_covers_every_rewrite():
    """The SQL replay set must keep covering each planner rewrite: at least
    one file asserts each optimized plan shape via EXPLAIN."""
    text = "\n".join(p.read_text() for p in ALL_SQL_FILES)
    for marker in (
        "LM_DISKANN_INDEX_SCAN",  # TopN rewrite fired
        "LM_DISKANN_INDEX_SCAN(residual_filter)",  # filter pull-up
        "TOP_N",  # negative case: rewrite correctly NOT fired
        "TOPK_AGG",  # min_by fallback shape
        "KNN_JOIN",  # lateral join rewrite fired
        "CROSS_PRODUCT",  # lateral join fallback shape
    ):
        assert marker in text, f"no sql file asserts {marker}"


def test_basic_sqllogic_file():
    n = run_sqllogic_file(SQL_DIR / "basic.sql.test")
    assert n >= 7


def test_mismatch_raises(tmp_path):
    bad = tmp_path / "bad.test"
    bad.write_text(
        "statement ok\nCREATE TABLE t (id INTEGER, vec FLOAT[2])\n\n"
        "statement ok\nINSERT INTO t VALUES (1, [0.0, 0.0])\n\n"
        "query I\nSELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 1\n"
        "----\n99\n"
    )
    with pytest.raises(SqlTestError, match="mismatch"):
        run_sqllogic_file(bad)


def test_minisql_brute_force_without_index():
    sql = MiniSql()
    sql.execute("CREATE TABLE t (id INTEGER, vec FLOAT[2])")
    sql.execute("INSERT INTO t VALUES (7, [0.0, 1.0]), (8, [1.0, 0.0])")
    rows = sql.execute(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.9, 0.1]) LIMIT 1"
    )
    assert rows == [[8]]


def test_statement_error_expectation(tmp_path):
    f = tmp_path / "err.test"
    f.write_text("statement error\nCREATE TABLE t (id INTEGER, vec FLOAT[2]\n")
    # malformed SQL -> error expected -> passes
    run_sqllogic_file(f)


def test_int8_sqllogic_file():
    n = run_sqllogic_file(Path(__file__).parent / "sql" / "int8.sql.test")
    assert n >= 8


def test_filtered_sqllogic_file():
    n = run_sqllogic_file(Path(__file__).parent / "sql" / "filtered.sql.test")
    assert n >= 7


def test_cosine_ternary_sql_file():
    n = run_sqllogic_file(
        Path(__file__).parent / "sql" / "cosine_ternary.sql.test"
    )
    assert n >= 9


def test_set_boolean_option_parses():
    """SET <opt> = false must store a real boolean, not the truthy string
    'false' (which would silently leave the option enabled)."""
    from duckdb_lm_diskann_tpu.db.sqltest import MiniSql

    sql = MiniSql()
    sql.execute("SET lm_diskann_filter_pushdown = false")
    assert sql.db.get_option("lm_diskann_filter_pushdown") is False
    sql.execute("SET lm_diskann_filter_pushdown = true")
    assert sql.db.get_option("lm_diskann_filter_pushdown") is True
    sql.execute("SET lm_diskann_l_search = 42")
    assert sql.db.get_option("lm_diskann_l_search") == 42
