"""Salting helpers must be exact: identical results to the unsalted op.

Plus the hot-key regressions backing bench_skew.py: the reference
join's emit-per-event semantics cost quadratic cells on a hot user
(Main.java:120-125 re-emits the full list on every event), while the
snapshot twin stays linear, and the salted join spreads a hot key over
(key, salt) reducers.
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench_skew import _hot_workload
from data_stream_flink_user_address_spark.operators.join import user_address_snapshot
from data_stream_flink_user_address_spark.operators.skew import salted_count, salted_join
from data_stream_flink_user_address_spark.streaming.stateful_join import (
    batch_emission_trace,
)


def test_salted_count_matches_plain_count(spark):
    # one heavy-hitter key (90%), several light keys
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k")
    )
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(df, ["k"], n_salts=8).collect()}
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    skewed = spark.range(5_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k bigint, name string")
    plain = sorted(
        (r["v"], r["name"])
        for r in skewed.join(small, "k").select("v", "name").collect()
    )
    salted = sorted(
        (r["v"], r["name"])
        for r in salted_join(skewed, small, skewed.k, small.k, n_salts=4)
        .select("v", "name")
        .collect()
    )
    assert salted == plain
    assert len(salted) == 5_000


def test_salted_join_plan_joins_on_salt(spark):
    """With broadcast off (the regime salting exists for), the physical
    join must key on (key, __salt) so a hot key spreads over n_salts
    reducers instead of landing on one."""
    skewed = spark.range(10_000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(i, f"d{i}") for i in range(3)], "k bigint, name string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(skewed, small, skewed.k, small.k, n_salts=4)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    keys_section = plan.split("Left keys", 1)
    assert len(keys_section) == 2, plan
    assert "__salt" in keys_section[1][:200], plan


def test_emission_trace_hot_key_quadratic_cells(spark):
    """The reference's emit-per-event semantics (Main.java:120-125): a
    hot user with n addresses emits n+1 rows carrying n(n+1)/2 address
    cells total -- the quadratic wall bench_skew.py extrapolates."""
    n = 300
    users, addresses = _hot_workload(spark, n)  # + 100 cold users x 3
    row = (
        batch_emission_trace(users, addresses)
        .agg(
            F.count(F.lit(1)).alias("emissions"),
            F.sum(F.size("addresses")).alias("cells"),
        )
        .collect()[0]
    )
    assert row["emissions"] == (n + 1) + 100 * 4
    assert row["cells"] == n * (n + 1) // 2 + 100 * 6


def test_snapshot_twin_is_linear_on_hot_key(spark):
    """The final-state twin (what the keyed sinks store) carries each
    address exactly once -- linear, so the same hot key is cheap."""
    n = 5_000
    users, addresses = _hot_workload(spark, n)
    row = (
        user_address_snapshot(users, addresses)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.size("addresses")).alias("cells"),
        )
        .collect()[0]
    )
    assert row["rows"] == 1 + 100
    assert row["cells"] == n + 3 * 100
