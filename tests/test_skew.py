"""Salting helpers must be exact: identical results to the unsalted op."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.operators.skew import salted_count, salted_join


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
