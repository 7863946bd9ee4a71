"""Every queries() entry must match its oracle_sql() on DuckDB at sf0.01.

This mirrors the driver's t2 correctness gate locally so regressions are
caught before a round ends.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle_or_is_flagged():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_dtype_gate_catches_uncast_hugeint(spark, con):
    """The r08 q12 red row: identical values, DuckDB HUGEINT vs Spark
    bigint.  The dtype gate must flag exactly this class of drift."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.sum(F.when(F.col("id") > 0, 1).otherwise(0)).alias("cnt")
    )
    bad = "SELECT sum(CASE WHEN range > 0 THEN 1 ELSE 0 END) AS cnt FROM range(3)"
    good = bad.replace("END)", "END)::BIGINT")
    problems = compare(df, con, bad, "uncast")
    assert any("dtype" in p and "i128" in p for p in problems), problems
    assert not compare(df, con, good, "cast")


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_parity(spark, con, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, SF_DIR)
    if name not in oracles:
        # rows-only check (matches the driver's weaker gate)
        assert df.count() >= 0
        return
    problems = compare(df, con, oracles[name], name)
    assert not problems, "\n".join(problems)
