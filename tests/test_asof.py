"""As-of join semantics: latest at-or-before match, equal-ts inclusion,
inner vs left behavior."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.operators.asof import asof_join


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.selectExpr(*[
        f"cast({c} as timestamp) as {c}" if c == "ts_s" else c for c in df.columns
    ]).withColumnRenamed("ts_s", "ts")


def test_asof_picks_latest_at_or_before(spark):
    left = _ts(spark, [
        (1, "u1", "2024-01-01 10:00:00"),
        (2, "u1", "2024-01-01 12:00:00"),
        (3, "u2", "2024-01-01 09:00:00"),
    ], "event_id long, k string, ts_s string")
    right = _ts(spark, [
        ("u1", "2024-01-01 09:30:00", 1.0),
        ("u1", "2024-01-01 11:00:00", 2.0),   # latest before event 2
        ("u1", "2024-01-01 13:00:00", 3.0),   # future: never matched
        ("u2", "2024-01-01 09:00:00", 9.0),   # equal ts: included
    ], "k string, ts_s string, v double")

    got = {
        r["event_id"]: r["r_v"]
        for r in asof_join(left, right, on="k").collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: 9.0}


def test_asof_left_keeps_unmatched(spark):
    left = _ts(spark, [(1, "u1", "2024-01-01 08:00:00")], "event_id long, k string, ts_s string")
    right = _ts(spark, [("u1", "2024-01-01 09:00:00", 1.0)], "k string, ts_s string, v double")
    assert asof_join(left, right, on="k", how="inner").count() == 0
    rows = asof_join(left, right, on="k", how="left").collect()
    assert len(rows) == 1 and rows[0]["r_v"] is None
