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
