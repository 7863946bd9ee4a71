"""Skew micro-bench: the reference's unbounded-list worst case.

The reference join (Main.java:104-132) keeps ONE growing address list
per user and re-emits the full list on every event (Main.java:120-125).
A single hot user with n addresses therefore costs O(n^2) EMISSION
CELLS -- not because of any engine defect, but by the operator's own
semantics.  This bench pins that wall and the engine's two answers:

1. ``batch_emission_trace`` at graded hot-key sizes: wall time scales
   with emitted cells (n(n+1)/2), i.e. quadratically in n.  At the
   titular n=1e5 the trace would emit ~5e9 address cells (hundreds of
   GB through Arrow) -- the bench extrapolates instead of executing it,
   and that extrapolation is the point: NEVER ship emit-per-event over
   an unbounded list at scale.
2. ``user_address_snapshot`` -- the LINEAR final-state twin (what the
   keyed sinks actually store) -- handles the same hot user at n=1e5
   directly.
3. ``salted_count`` / ``salted_join`` vs their plain equivalents on a
   95%-hot-key fact table with broadcast disabled (the can't-broadcast
   regime where salting is the remaining tool; AQE handles the rest).

Run: ``python bench_skew.py`` -- prints one JSON line.
Companion regression tests: tests/test_skew.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.operators.join import user_address_snapshot
from data_stream_flink_user_address_spark.operators.skew import salted_count, salted_join
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.streaming.stateful_join import (
    batch_emission_trace,
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _hot_workload(spark, n_hot: int, n_cold: int = 100):
    """1 hot user with n_hot addresses + n_cold users with 3 each."""
    users = (
        spark.range(n_cold + 1)
        .select(
            F.when(F.col("id") == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("u"), F.col("id")))
            .alias("id"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
            F.concat(F.lit("e"), F.col("id"), F.lit("@x.com")).alias("email"),
            F.lit("F").alias("genre"),
            F.lit(None).cast("timestamp").alias("registerDate"),
        )
        .withColumn("seq", F.lit(0).cast("long"))
    )
    hot_addrs = spark.range(n_hot).select(
        F.lit("hot").alias("userId"), F.col("id").alias("i")
    )
    cold_addrs = (
        spark.range(n_cold)
        .select(F.concat(F.lit("u"), F.col("id") + 1).alias("userId"))
        .withColumn("i", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
        .select("userId", (F.col("i") + n_hot).alias("i"))
    )
    addresses = (
        hot_addrs.unionByName(cold_addrs)
        .select(
            "userId",
            F.concat(F.lit("addr"), F.col("i")).alias("address"),
            F.lit("c").alias("city"),
            F.concat(F.lit("S"), F.col("i") % 5).alias("state"),
            F.lit("z").alias("zipCode"),
            F.lit("C").alias("country"),
            (F.col("i") + 1).cast("long").alias("seq"),
        )
    )
    return users, addresses


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main():
    spark = get_spark("skew-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).count()  # JVM warmup

    result = {"metric": "skew_bench", "unit": "sec", "cpus": int(CPUS)}

    # -- 1. emission-trace scaling on the hot key (quadratic in n) ------
    # One hot key is ONE applyInPandas group = ONE task: the wall is both
    # quadratic in n AND serialized on a single core, by the operator's
    # own emit-the-whole-list semantics.  Measured rate is ~3-4e5
    # cells/sec/core (n=2k -> ~7.5s, n=8k -> ~77s on this box), so the
    # graded points stay small and the 1e5 wall is extrapolated.
    trace_points = []
    for n in (1_000, 2_000, 4_000):
        users, addresses = _hot_workload(spark, n)
        sec, row = _timed(
            lambda: batch_emission_trace(users, addresses)
            .agg(
                F.count(F.lit(1)).alias("emissions"),
                F.sum(F.size("addresses")).alias("cells"),
            )
            .collect()
        )
        cells = int(row[0]["cells"])
        trace_points.append(
            {"n_hot": n, "sec": round(sec, 3), "cells": cells,
             "cells_per_sec": int(cells / sec)}
        )
    result["emission_trace_hot_key"] = trace_points
    # cells grow ~ n^2/2; throughput (cells/sec) should be roughly flat,
    # making wall time quadratic in n.  Extrapolate the titular 1e5:
    rate = trace_points[-1]["cells_per_sec"]
    cells_1e5 = 100_000 * 100_001 // 2
    result["emission_trace_1e5_extrapolated_sec"] = round(cells_1e5 / rate, 1)
    result["emission_trace_1e5_cells"] = cells_1e5

    # -- 2. the linear twin DOES run n=1e5 directly ---------------------
    users, addresses = _hot_workload(spark, 100_000)
    sec, row = _timed(
        lambda: user_address_snapshot(users, addresses)
        .agg(F.count(F.lit(1)).alias("rows"), F.sum(F.size("addresses")).alias("cells"))
        .collect()
    )
    assert int(row[0]["cells"]) == 100_000 + 3 * 100
    result["snapshot_hot_1e5_sec"] = round(sec, 3)

    # -- 3. salted vs plain agg/join on a 95%-hot-key fact --------------
    fact = spark.range(20_000_000).select(
        F.when(F.col("id") % 20 < 19, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 32).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    sec_plain, _ = _timed(lambda: fact.groupBy("k").count().collect())
    sec_salted, _ = _timed(lambda: salted_count(fact, ["k"], n_salts=32).collect())
    result["count_hot_plain_sec"] = round(sec_plain, 3)
    result["count_hot_salted_sec"] = round(sec_salted, 3)

    # -- 4. salting vs AQE skew-join, same workload ---------------------
    # The session default (session.py) keeps AQE + skewJoin ON, so the
    # historical "plain" number below was already AQE-assisted.  Compare
    # all three regimes explicitly:
    #   plain/noaqe   -- no runtime re-plan at all (the true baseline)
    #   plain/aqeskew -- AQE skew-join with the split thresholds TUNED
    #                    to this partition size (defaults: 256 MB split
    #                    threshold -- far above the ~150 MB hot
    #                    partition here, so default AQE never splits it)
    #   salted        -- manual n_salts=32 replication (operators/skew.py)
    dim = spark.createDataFrame(
        [("hot", "dhot")] + [(f"k{i}", f"d{i}") for i in range(32)], "k string, d string"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        sec_pj_noaqe, _ = _timed(lambda: fact.join(dim, "k").count())
        sec_sj, _ = _timed(
            lambda: salted_join(fact, dim, fact.k, dim.k, n_salts=32).count()
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        sec_pj_aqedef, _ = _timed(lambda: fact.join(dim, "k").count())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        sec_pj_aqetuned, _ = _timed(lambda: fact.join(dim, "k").count())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    result["join_hot_plain_noaqe_nobroadcast_sec"] = round(sec_pj_noaqe, 3)
    result["join_hot_plain_aqe_default_sec"] = round(sec_pj_aqedef, 3)
    result["join_hot_plain_aqe_tuned_sec"] = round(sec_pj_aqetuned, 3)
    result["join_hot_salted_nobroadcast_sec"] = round(sec_sj, 3)

    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "SKEW_BENCH.json"),
        "w",
    ) as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
