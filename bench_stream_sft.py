"""Measured streaming SFT conversation ingest: N micro-batches of JSON
chats flow through parse -> structural gate -> loss-mask turn flatten
-> parquet span-manifest sink, the instruction-data twin of the
curation admission pipelines (file source -> foreachBatch -> __epoch
survivor partitions).

Each micro-batch: 100k conversations (3/5/7 turns by id % 3), with
~3% malformed JSON rows and ~8% structurally invalid chats (trailing
unanswered user turn) planted -- the gate must drop both, the flatten
must emit spans only for survivors.  All ops are row-local
expressions (plan-pinned zero-exchange in tests/test_plan_shapes.py),
so per-epoch wall should be flat and convs/s should track the chat
ladder's batch numbers (R15B_OPS_SCALE.json).

Writes key ``sft_ingest_stream`` into STREAM_BENCH.json.
Run:  python bench_stream_sft.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.chat import (
    streaming_sft_gate,
)
from data_stream_flink_user_address_spark.session import get_spark

N_BATCHES = int(os.environ.get("SPARK_GRAFT_SFT_BATCHES", "10"))
CONVS_PER_BATCH = int(os.environ.get("SPARK_GRAFT_SFT_CONVS", "100000"))
ROOT = "/tmp/stream_sft_bench"


def write_batch(spark, b: int, src: str) -> None:
    D = CONVS_PER_BATCH

    def word(j):
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64("id", F.lit(j)), F.lit(4096)).cast("string"),
        )

    def turn(role, content):
        return F.struct(F.lit(role).alias("role"), content.alias("content"))

    def pair(u, a):
        return F.array(turn("user", u), turn("assistant", a))

    base = F.concat(
        F.array(turn("system", F.lit("Be concise."))),
        pair(F.concat_ws(" ", *[word(j) for j in range(8)]),
             F.concat_ws(" ", *[word(j) for j in range(8, 24)])),
    )
    p2 = pair(F.lit("And then?"),
              F.concat_ws(" ", *[word(j) for j in range(24, 32)]))
    p3 = pair(F.lit("Summarize."),
              F.concat_ws(" ", *[word(j) for j in range(4)]))
    arr = (
        F.when(F.col("id") % 3 == 1, F.concat(base, p2))
        .when(F.col("id") % 3 == 2, F.concat(base, p2, p3))
        .otherwise(base)
    )
    # planted defects: ~8% trailing unanswered user turn (structural
    # reject), ~3% malformed JSON (parse reject)
    arr = F.when(
        F.col("id") % 13 == 5,
        F.concat(arr, F.array(turn("user", F.lit("hello?")))),
    ).otherwise(arr)
    payload = F.when(
        F.col("id") % 31 == 7, F.lit("{truncated upload")
    ).otherwise(F.to_json(arr))
    (
        spark.range(b * D, (b + 1) * D)
        .select(F.col("id").alias("conv_id"), payload.alias("conversation"))
        .write.mode("overwrite")
        .json(os.path.join(src, f"batch_{b}"))
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_stream_sft")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)
    src = os.path.join(ROOT, "src")
    os.makedirs(src)
    out = os.path.join(ROOT, "out")
    ck = os.path.join(ROOT, "ck")

    for b in range(N_BATCHES):
        write_batch(spark, b, src)

    stream = (
        spark.readStream.schema("conv_id long, conversation string")
        .option("maxFilesPerTrigger", str(32))
        .json(os.path.join(src, "batch_*"))
    )
    q = streaming_sft_gate(stream, out, ck)
    epoch_walls: list[float] = []
    try:
        t_all = time.perf_counter()
        q.processAllAvailable()
        total_wall = round(time.perf_counter() - t_all, 3)
        for p in q.recentProgress:
            if p["numInputRows"] > 0:
                epoch_walls.append(
                    round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
                )
    finally:
        q.stop()

    turns = spark.read.parquet(out)
    n_turns = turns.count()
    n_convs_kept = turns.select("conv_id").distinct().count()
    masked = turns.filter("loss_mask").count()
    total = N_BATCHES * CONVS_PER_BATCH
    entry = {
        "n_batches": N_BATCHES,
        "convs_per_batch": CONVS_PER_BATCH,
        "total_convs": total,
        "convs_kept": n_convs_kept,
        "kept_frac": round(n_convs_kept / total, 4),
        "turns_emitted": n_turns,
        "masked_turns": masked,
        "epochs_with_rows": len(epoch_walls),
        "epoch_walls_s": epoch_walls,
        "total_wall_s": total_wall,
        "convs_per_sec": round(total / total_wall, 1),
    }
    # the gate math: id%31==7 malformed (~1/31), id%13==5 trailing-user
    # (~1/13), overlapping ids rejected once
    assert entry["kept_frac"] < 0.93 and entry["kept_frac"] > 0.85, entry

    path = os.path.join(os.path.dirname(__file__), "STREAM_BENCH.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["sft_ingest_stream"] = entry
    with open(path, "w") as fh:
        json.dump(data, fh, indent=2)
        fh.write("\n")
    print(json.dumps({"sft_ingest_stream": entry}))


if __name__ == "__main__":
    main()
