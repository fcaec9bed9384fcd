"""SQL-logic-test replay harness.

The reference's primary intended test method is sqllogictest files
(test/sql/basic.sql.test: ``require lm_diskann`` + ``statement ok`` /
``query`` blocks with ``----`` expected results, run through DuckDB's
unittest runner — SURVEY §4). This module replays the same file format
against this framework's Database surface, supporting the SQL subset the
vector-index surface uses:

    CREATE TABLE t (id INTEGER, vec FLOAT[D])
    INSERT INTO t VALUES (1, [0.1, 0.2, ...]), ...
    CREATE INDEX idx ON t USING LM_DISKANN (vec) WITH (METRIC='l2', ...)
    SELECT id FROM t ORDER BY array_distance(vec, [..]) LIMIT k
    DELETE FROM t WHERE id = n
    PRAGMA lm_diskann_index_info
    PRAGMA lm_diskann_compact_index('idx')

This doubles as the bit-identical replay check: run the reference's query
set, diff returned row ids.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

from ..common.types import MetricType
from .database import Database

_DIST_FUNCS = {
    "array_distance": MetricType.L2,
    "array_cosine_distance": MetricType.COSINE,
    "array_negative_inner_product": MetricType.IP,
}


class SqlTestError(AssertionError):
    pass


def _parse_vector(text: str) -> np.ndarray:
    return np.asarray([float(x) for x in re.findall(r"-?\d+\.?\d*(?:e-?\d+)?", text)],
                      np.float32)


class MiniSql:
    """Executes the supported SQL subset against a Database."""

    def __init__(self, db: Database | None = None):
        self.db = db or Database()

    def execute(self, sql: str):
        sql = sql.strip().rstrip(";")
        low = sql.lower()

        m = re.match(r"create\s+table\s+(\w+)\s*\((.*)\)\s*$", low, re.S)
        if m:
            name = m.group(1)
            cols = {}
            for cdef in re.split(r",(?![^\[]*\])", m.group(2)):
                parts = cdef.strip().split()
                cname, ctype = parts[0], " ".join(parts[1:])
                am = re.match(r"(float|real|tinyint)\s*\[\s*(\d+)\s*\]", ctype)
                if am:
                    # TINYINT[N] -> int8 column (ARRAY(TINYINT, N): the
                    # reference's int8 vector columns,
                    # db/LmDiskannIndex.cpp:137-154)
                    dt = np.int8 if am.group(1) == "tinyint" else np.float32
                    cols[cname] = np.empty((0, int(am.group(2))), dt)
                else:
                    cols[cname] = np.empty((0,), np.int64)
            self.db.create_table(name, cols)
            return []

        m = re.match(r"insert\s+into\s+(\w+)\s+values\s*(.*)$", low, re.S)
        if m:
            t = self.db.tables[m.group(1)]
            rows = re.findall(r"\(((?:[^()\[\]]|\[[^\]]*\])*)\)", m.group(2))
            col_names = list(t.columns)
            values = {c: [] for c in col_names}
            for row in rows:
                fields = re.split(r",(?![^\[]*\])", row)
                for c, f in zip(col_names, fields):
                    f = f.strip()
                    if f.startswith("["):
                        values[c].append(_parse_vector(f))
                    else:
                        values[c].append(int(float(f)))
            arrs = {}
            for c in col_names:
                if t.columns[c].ndim == 2:
                    arrs[c] = np.asarray(values[c]).astype(t.columns[c].dtype)
                else:
                    arrs[c] = np.asarray(values[c], np.int64)
            t.insert(arrs)
            return []

        m = re.match(
            r"create\s+index\s+(\w+)\s+on\s+(\w+)\s+using\s+lm_diskann\s*"
            r"\(\s*(\w+)\s*\)(?:\s+with\s*\((.*)\))?\s*$",
            low, re.S,
        )
        if m:
            options = {}
            if m.group(4):
                for kv in m.group(4).split(","):
                    k, v = kv.split("=")
                    options[k.strip()] = v.strip().strip("'\"")
            self.db.create_index(m.group(1), m.group(2), m.group(3), options=options)
            return []

        m = re.match(
            r"select\s+(\w+)\s+from\s+(\w+)"
            r"(?:\s+where\s+(\w+)\s*=\s*(-?\d+))?"
            r"\s+order\s+by\s+(\w+)\s*\(\s*(\w+)\s*,"
            r"\s*(\[[^\]]*\])\s*\)\s*(?:asc\s*)?limit\s+(\d+)\s*$",
            low, re.S,
        )
        if m:
            out_col, tname, wcol, wval, fn, vcol, qtext, k = m.groups()
            if fn not in _DIST_FUNCS:
                raise SqlTestError(f"unsupported distance function {fn}")
            flt = None
            if wcol is not None:
                # WHERE col = const above the TopN: becomes the residual
                # filter the optimizer pulls up / pushes down
                # (hnsw_optimize_scan.cpp:160-200 + filtered search).
                want = int(wval)

                def flt(table, rowids, _c=wcol, _v=want):
                    return np.asarray(table.fetch(rowids, _c)) == _v

            res = self.db.knn(
                tname, vcol, _parse_vector(qtext), int(k),
                metric=_DIST_FUNCS[fn], filter=flt,
            )
            t = self.db.tables[tname]
            if out_col == "rowid":
                return [[int(r)] for r in res["row_ids"]]
            return [[v.item() if hasattr(v, "item") else v]
                    for v in t.fetch(res["row_ids"], out_col)]

        m = re.match(r"delete\s+from\s+(\w+)\s+where\s+(\w+)\s*=\s*(\d+)\s*$", low)
        if m:
            t = self.db.tables[m.group(1)]
            col, val = m.group(2), int(m.group(3))
            if col == "rowid":
                t.delete([val])
            else:
                mask = t.columns[col] == val
                t.delete(t.row_ids[mask].tolist())
            return []

        m = re.match(r"set\s+(\w+)\s*=\s*'?([\w.]+)'?\s*$", low)
        if m:
            # Session option (SET lm_diskann_l_search = ..., the
            # hnsw_ef_search analog, hnsw_index.cpp:667-675).
            name, val = m.group(1), m.group(2)
            if val in ("true", "on"):
                value = True  # boolean options (filter_pushdown,
            elif val in ("false", "off"):
                value = False  # enable_persistence) — a raw string
                # "false" would be truthy and silently do nothing
            else:
                try:
                    value = int(val)
                except ValueError:
                    try:
                        value = float(val)
                    except ValueError:
                        value = val
            self.db.set_option(name, value)
            return []

        m = re.match(r"pragma\s+lm_diskann_index_info\s*$", low)
        if m:
            return [
                [r["index_name"], r["metric"], r["dimensions"], r["count"]]
                for r in self.db.pragma_lm_diskann_index_info()
            ]

        m = re.match(r"pragma\s+lm_diskann_compact_index\s*\(\s*'(\w+)'\s*\)\s*$", low)
        if m:
            return [[self.db.lm_diskann_compact_index(m.group(1))]]

        raise SqlTestError(f"unsupported SQL: {sql!r}")


def run_sqllogic_file(path: str | Path, db: Database | None = None) -> int:
    """Replay a sqllogictest file. Returns the number of directives run;
    raises SqlTestError on any mismatch."""
    sql = MiniSql(db)
    text = Path(path).read_text()
    blocks = re.split(r"\n\s*\n", text)
    executed = 0
    for block in blocks:
        lines = [
            ln for ln in block.splitlines()
            if ln.strip() and not ln.strip().startswith("#")
        ]
        if not lines:
            continue
        head = lines[0].split()
        if head[0] == "require":
            # 'require lm_diskann' — always satisfied here.
            executed += 1
            continue
        if head[0] == "load" or head[0] == "mode":
            executed += 1
            continue
        if head[0] == "statement":
            expect_ok = head[1] == "ok"
            stmt = "\n".join(lines[1:])
            failure: Exception | None = None
            try:
                sql.execute(stmt)
            except Exception as e:  # noqa: BLE001 - any failure counts
                failure = e
            if expect_ok and failure is not None:
                raise SqlTestError(
                    f"statement failed: {stmt}: {failure}"
                ) from failure
            if not expect_ok and failure is None:
                raise SqlTestError(f"statement unexpectedly succeeded: {stmt}")
            executed += 1
            continue
        if head[0] == "query":
            body = lines[1:]
            if "----" in body:
                sep = body.index("----")
                stmt = "\n".join(body[:sep])
                expected = [ln.strip() for ln in body[sep + 1 :]]
            else:
                stmt = "\n".join(body)
                expected = None
            rows = sql.execute(stmt)
            got = ["\t".join(str(v) for v in row) for row in rows]
            if expected is not None and got != expected:
                raise SqlTestError(
                    f"query result mismatch for {stmt!r}:\n"
                    f"  got:      {got}\n  expected: {expected}"
                )
            executed += 1
            continue
        raise SqlTestError(f"unknown directive {head[0]!r}")
    return executed
