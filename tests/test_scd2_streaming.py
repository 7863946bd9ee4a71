"""SCD2 applied per micro-batch via foreachBatch -- the incremental
dimension-maintenance pipeline the operator docstring promises.

Each micro-batch of changes folds into a parquet-backed dimension with
``scd2_apply``; after two batches (delivered separately, including a
change for a key already versioned by batch one) the table must equal
applying ALL changes at once -- the fold is associative because each
batch's changes are later than the state they extend."""

import json
import os
import sys
import uuid
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_stream_flink_user_address_spark.operators.scd2 import scd2_apply

CH_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("seg", T.StringType()),
        T.StructField("ts_s", T.StringType()),
    ]
)


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for k, seg, ts in rows:
            f.write(json.dumps({"k": k, "seg": seg, "ts_s": ts}) + "\n")


def test_scd2_foreach_batch_stream(spark, tmp_path):
    dim_path = str(tmp_path / "dim")
    src = str(tmp_path / "changes")
    os.makedirs(src)

    base = [(1, "A"), (2, "B"), (3, "C")]
    spark.createDataFrame(
        [(k, s, datetime(2020, 1, 1), None, True) for k, s in base],
        "k long, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
    ).write.mode("overwrite").parquet(dim_path)

    def fold(batch_df, batch_id):
        changes = batch_df.select(
            "k", "seg", F.col("ts_s").cast("timestamp").alias("change_ts")
        )
        current = spark.read.parquet(dim_path)
        updated = scd2_apply(current, changes, ["k"], ["seg"])
        # collect-then-rewrite: the dimension is small by definition of
        # foreachBatch SCD2 (at scale this write goes through the
        # transactional keyed sink instead)
        rows = updated.collect()
        spark.createDataFrame(rows, updated.schema).write.mode("overwrite").parquet(
            dim_path
        )

    b1 = [(1, "X", "2021-01-01 00:00:00"), (2, "Y", "2021-06-01 00:00:00")]
    b2 = [(1, "Z", "2022-01-01 00:00:00"), (4, "N", "2022-03-01 00:00:00")]
    _write_batch(src, "b1.json", b1)

    name = f"scd2_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.schema(CH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.outputMode("append")
        .foreachBatch(fold)
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(src, "b2.json", b2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.k, r.seg, r.valid_from, r.valid_to, r.is_current)
        for r in spark.read.parquet(dim_path).collect()
    )

    # oracle: one-shot application of all changes
    all_changes = spark.createDataFrame(
        [(k, s, datetime.fromisoformat(t)) for k, s, t in b1 + b2],
        "k long, seg string, change_ts timestamp",
    )
    current0 = spark.createDataFrame(
        [(k, s, datetime(2020, 1, 1), None, True) for k, s in base],
        "k long, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    expect = sorted(
        (r.k, r.seg, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(current0, all_changes, ["k"], ["seg"]).collect()
    )
    assert got == expect
    # spot checks: key 1 has the full 3-version chain, key 4 opened new
    k1 = [g for g in got if g[0] == 1]
    assert [v[1] for v in sorted(k1, key=lambda v: v[2])] == ["A", "X", "Z"]
    assert (4, "N", datetime(2022, 3, 1), None, True) in got
