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


# --- dtype family canonicalization -----------------------------------------
#
# The driver's value hash is type-sensitive: r08's only red row
# (q12_late_shipments) had identical VALUES on both engines but DuckDB
# returned HUGEINT where Spark returned bigint.  The local gate therefore
# maps both engines' result dtypes onto one family vocabulary and flags
# any per-column mismatch before the driver can.

_SPARK_FAMILY = {
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "integer": "i32",
    "bigint": "i64",
    "long": "i64",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bin",
}

_DUCK_FAMILY = {
    "TINYINT": "i8",
    "SMALLINT": "i16",
    "INTEGER": "i32",
    "BIGINT": "i64",
    "HUGEINT": "i128",
    "UTINYINT": "u8",
    "USMALLINT": "u16",
    "UINTEGER": "u32",
    "UBIGINT": "u64",
    "FLOAT": "f32",
    "REAL": "f32",
    "DOUBLE": "f64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "bin",
}


def _spark_family(simple: str) -> str:
    simple = simple.strip()
    if simple.startswith("array<") and simple.endswith(">"):
        return f"arr<{_spark_family(simple[6:-1])}>"
    if simple.startswith("decimal("):
        return "dec" + simple[len("decimal"):]
    return _SPARK_FAMILY.get(simple, simple)


def _duck_family(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"arr<{_duck_family(t[:-2])}>"
    if t.startswith("DECIMAL("):
        return "dec" + t[len("DECIMAL"):].replace(" ", "")
    return _DUCK_FAMILY.get(t, t)


def compare_dtypes(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Per-column dtype-family mismatches between Spark and DuckDB results.

    Exact-family match is required (i64 != i128, i32 != i64, f32 != f64,
    dec(p,s) compared literally) -- this is the class of parity bug the
    canonical value comparison below cannot see but the driver's hash can.
    """
    problems: list[str] = []
    rel = con.sql(sql)
    d_types = {c: _duck_family(str(t)) for c, t in zip(rel.columns, rel.types)}
    s_types = {f.name: _spark_family(f.dataType.simpleString()) for f in spark_df.schema.fields}
    for col in sorted(set(s_types) & set(d_types)):
        if s_types[col] != d_types[col]:
            problems.append(
                f"{name}.{col}: dtype spark={s_types[col]} duckdb={d_types[col]}"
            )
    return problems


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):  # int(v) would raise OverflowError below
            return "inf" if v > 0 else "-inf"
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
    # The driver's canonicalizer sorts the result through
    # pandas.sort_values, which raises "unhashable type: 'list'" on any
    # complex-typed column (r09's one red row, embedding_quantize's raw
    # qvec array).  Mirror that limit here: oracle-checked queries must
    # serialize arrays/maps/structs to scalars before returning.
    for f in spark_df.schema.fields:
        simple = f.dataType.simpleString()
        if simple.startswith(("array<", "map<", "struct<")):
            problems.append(
                f"{name}.{f.name}: complex type {simple} breaks the "
                "driver canonicalizer -- serialize (concat_ws/md5) first"
            )
    if problems:
        return problems
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    problems.extend(compare_dtypes(spark_df, con, sql, name))
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
