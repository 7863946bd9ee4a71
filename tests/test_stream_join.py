"""Native watermarked stream-stream join: in-window match, out-of-window
drop, cross-batch buffering."""

import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from data_stream_flink_user_address_spark.streaming.stream_join import (
    watermarked_stream_join,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("eid", T.LongType()),
    ]
)


def test_stream_stream_join_within_window(spark, tmp_path):
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ldir)
    os.makedirs(rdir)
    name = f"ssj_{uuid.uuid4().hex[:8]}"

    def write(d, fname, rows):
        with open(os.path.join(d, fname), "w") as f:
            for k, ts, eid in rows:
                f.write(json.dumps({"k": k, "ts": ts, "eid": eid}) + "\n")

    left = spark.readStream.schema(SCHEMA).json(ldir)
    right = spark.readStream.schema(SCHEMA).json(rdir)
    joined = watermarked_stream_join(
        left, right, on="k", watermark_delay="5 seconds", within="10 minutes"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        # batch 1: left events; matching right arrives in batch 2
        # (cross-batch buffering is the point of a stream-stream join)
        write(ldir, "l1.json", [
            ("a", "2024-01-01 00:00:00", 1),
            ("b", "2024-01-01 00:00:00", 2),
        ])
        q.processAllAvailable()
        write(rdir, "r1.json", [
            ("a", "2024-01-01 00:05:00", 100),   # within 10 min -> match
            ("b", "2024-01-01 00:20:00", 200),   # outside window -> no match
            ("a", "2023-12-31 23:59:00", 300),   # before left -> no match
        ])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT eid, r_eid FROM {name}").collect()
    finally:
        q.stop()
    assert sorted((r["eid"], r["r_eid"]) for r in rows) == [(1, 100)]
