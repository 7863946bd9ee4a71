"""JsonlMetricsListener captures per-batch progress for a live stream,
including stateful-operator state rows."""

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_stream_flink_user_address_spark.streaming.metrics import (
    JsonlMetricsListener,
    read_metrics,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def test_listener_records_progress_and_state(spark, tmp_path):
    metrics_path = str(tmp_path / "metrics.jsonl")
    listener = JsonlMetricsListener(metrics_path)
    spark.streams.addListener(listener)
    src = str(tmp_path / "in")
    os.makedirs(src)
    name = f"met_{uuid.uuid4().hex[:8]}"
    try:
        with open(os.path.join(src, "b1.json"), "w") as f:
            for i in range(100):
                f.write(json.dumps({"k": f"k{i % 5}", "v": i}) + "\n")
        stream = spark.readStream.schema(SCHEMA).json(src)
        agg = stream.groupBy("k").agg(F.sum("v").alias("total"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            with open(os.path.join(src, "b2.json"), "w") as f:
                f.write(json.dumps({"k": "k9", "v": 1}) + "\n")
            q.processAllAvailable()
        finally:
            q.stop()
        # listener events are delivered asynchronously on the bus thread
        deadline = time.time() + 30
        recs = []
        while time.time() < deadline:
            if os.path.exists(metrics_path):
                recs = read_metrics(metrics_path)
                progress = [
                    r for r in recs
                    if r["event"] == "progress" and r["name"] == name
                    and r["numInputRows"] > 0
                ]
                if len(progress) >= 2 and any(
                    r["event"] == "terminated" for r in recs
                ):
                    break
            time.sleep(0.5)
        assert any(r["event"] == "started" for r in recs)
        progress = [
            r for r in recs
            if r["event"] == "progress" and r["name"] == name and r["numInputRows"] > 0
        ]
        assert len(progress) >= 2
        first = progress[0]
        assert first["numInputRows"] == 100
        assert first["batchDurationMs"] > 0
        # the streaming agg is stateful: state rows = distinct keys so far
        assert first["stateOperators"] and first["stateOperators"][0]["numRowsTotal"] == 5
        assert progress[1]["stateOperators"][0]["numRowsTotal"] == 6
    finally:
        spark.streams.removeListener(listener)
