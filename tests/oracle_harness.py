"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive canonical value multiset.  Exact
string equality after canonicalization -- if a float differs at all, the
query needs rounding in both engines, which is precisely what the real
driver's value-hash would flag.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows_to_multiset(rows, col_order):
    return sorted(",".join(_canon(r[i]) for i in col_order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_order = order
    d_index = {c: i for i, c in enumerate(d_cols)}
    d_order = [d_index[s_cols[i]] for i in order]
    s_set = _rows_to_multiset(s_rows, s_order)
    d_set = _rows_to_multiset(d_rows, d_order)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b]
        only_s = [x for x in s_set if x not in set(d_set)][:3]
        only_d = [x for x in d_set if x not in set(s_set)][:3]
        problems.append(
            f"{name}: values differ ({len(diffs)} positions); spark-only={only_s} duckdb-only={only_d}"
        )
    return problems
