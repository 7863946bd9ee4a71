"""Window-operator tests: event-time watermark semantics on a real
stream (append-mode finalization, late-data drop), sliding overlap,
and session gap splitting."""

import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from data_stream_flink_user_address_spark.operators.windows import (
    session_window_count,
    sliding_window_count,
    watermarked_window_count,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("etype", T.StringType()),
    ]
)


def test_watermarked_stream_finalizes_windows_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    mem_name = f"wm_{uuid.uuid4().hex[:8]}"

    def write_file(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for ts, et in rows:
                f.write(json.dumps({"ts": ts, "etype": et}) + "\n")

    # batch 1: two events in window [00:00, 00:01), one in [00:01, 00:02)
    write_file("b1.json", [
        ("2024-01-01 00:00:10", "A"),
        ("2024-01-01 00:00:40", "A"),
        ("2024-01-01 00:01:30", "A"),
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    counted = watermarked_window_count(
        stream, "ts", "etype", "1 minute", watermark_delay="10 seconds"
    )
    q = (
        counted.writeStream.outputMode("append")
        .format("memory")
        .queryName(mem_name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the already-passed first window
        # (watermark is 00:01:20 after batch 1) plus a fresh event that
        # advances the watermark far enough to finalize everything prior
        write_file("b2.json", [
            ("2024-01-01 00:00:20", "A"),   # late -> dropped
            ("2024-01-01 00:05:00", "A"),
        ])
        q.processAllAvailable()
        # batch 3: advance the watermark again so [00:01, 00:02) emits
        write_file("b3.json", [("2024-01-01 00:09:00", "A")])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["window_start"].strftime("%H:%M"): r["count"]
        for r in spark.sql(f"SELECT * FROM {mem_name}").collect()
    }
    # first window finalized with exactly 2: the late arrival was dropped
    assert got["00:00"] == 2
    assert got["00:01"] == 1


def test_sliding_window_overlap(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:45", "A")], "ts_s string, etype string"
    ).selectExpr("cast(ts_s as timestamp) as ts", "etype")
    rows = sliding_window_count(df, "ts", "etype", "1 minute", "30 seconds").collect()
    # 1-min window sliding every 30s -> the event lands in 2 windows
    starts = sorted(r["window_start"].strftime("%H:%M:%S") for r in rows)
    assert starts == ["00:00:00", "00:00:30"]
    assert all(r["count"] == 1 for r in rows)


def test_session_window_gap_splits(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "u1"),
            ("2024-01-01 00:03:00", "u1"),   # within 5-min gap -> same session
            ("2024-01-01 00:20:00", "u1"),   # gap > 5 min -> new session
            ("2024-01-01 00:00:00", "u2"),
        ],
        "ts_s string, user string",
    ).selectExpr("cast(ts_s as timestamp) as ts", "user")
    rows = session_window_count(df, "ts", "user", gap="5 minutes").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user"], []).append(r["count"])
    assert sorted(by_user["u1"]) == [1, 2]
    assert by_user["u2"] == [1]


def test_flatten_count_map(spark):
    from data_stream_flink_user_address_spark.operators.windows import flatten_count_map

    df = spark.createDataFrame(
        [({"Illinois": 3, "Texas": 1},)], "m map<string,int>"
    )
    got = {r["state"]: r["count"] for r in flatten_count_map(df, "m", "state").collect()}
    assert got == {"Illinois": 3, "Texas": 1}


def test_session_window_streaming_matches_batch(spark, tmp_path):
    """The SAME session_window_count call runs under Structured
    Streaming with a watermark: closed sessions emitted in append mode
    equal the batch answer (the sentinel flush event only advances the
    watermark; its still-open session is the one row withheld)."""
    import json as _json
    import uuid as _uuid

    from pyspark.sql import types as T

    from data_stream_flink_user_address_spark.operators.windows import (
        session_window_count,
    )

    rows = [
        ("2024-01-01 00:00:00", "u1"),
        ("2024-01-01 00:03:00", "u1"),
        ("2024-01-01 00:20:00", "u1"),
        ("2024-01-01 00:01:00", "u2"),
    ]
    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for ts, u in rows:
            f.write(_json.dumps({"ts_s": ts, "user": u}) + "\n")
        # flush: pushes the watermark past every real session's end
        f.write(_json.dumps({"ts_s": "2024-01-02 00:00:00", "user": "flush"}) + "\n")

    schema = T.StructType(
        [T.StructField("ts_s", T.StringType()), T.StructField("user", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(src)
        .selectExpr("cast(ts_s as timestamp) as ts", "user")
        .withWatermark("ts", "10 seconds")
    )
    name = f"sess_{_uuid.uuid4().hex[:8]}"
    q = (
        session_window_count(stream, "ts", "user", gap="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch re-triggers so the advanced watermark closes sessions
        with open(os.path.join(src, "b2.json"), "w") as f:
            f.write(_json.dumps({"ts_s": "2024-01-02 00:00:01", "user": "flush"}) + "\n")
        q.processAllAvailable()
        got = {
            (r["user"], r["count"])
            for r in spark.sql(f"select * from {name}").collect()
            if r["user"] != "flush"
        }
    finally:
        q.stop()

    batch_df = spark.createDataFrame(rows, "ts_s string, user string").selectExpr(
        "cast(ts_s as timestamp) as ts", "user"
    )
    expect = {
        (r["user"], r["count"])
        for r in session_window_count(batch_df, "ts", "user", gap="5 minutes").collect()
    }
    assert got == expect
