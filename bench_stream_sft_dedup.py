"""Measured validity-then-novelty SFT admission: the composed stream
the streaming_sft_gate docstring promises -- every micro-batch of JSON
chats runs parse -> structural gate -> render -> EXACT dedup against a
persisted, growing fingerprint store -> survivors' loss-mask turn rows
land as ``__epoch`` partitions.

Each micro-batch: 100k conversations; besides the planted malformed
(~1/31) and trailing-user (~1/13) defects of ``bench_stream_sft``,
conversations with even ids from batch 1 on DUPLICATE a previous
batch's conversation verbatim (the re-submitted-chat shape), so from
epoch 1 the novelty gate must reject ~half of the structurally valid
arrivals and per-epoch cost must stay flat as the store grows
(the incremental-dedup contract, here fed by chat rendering).

Writes key ``sft_ingest_dedup_stream`` into STREAM_BENCH.json.
Run:  python bench_stream_sft_dedup.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_stream_sft import CONVS_PER_BATCH, N_BATCHES
from data_stream_flink_user_address_spark.functions.chat import (
    _structural_flags,
    conversation_turns,
    parse_conversations,
    render_conversation,
)
from data_stream_flink_user_address_spark.functions.dedup import (
    incremental_exact_dedup,
)
from data_stream_flink_user_address_spark.session import get_spark

ROOT = "/tmp/stream_sft_dedup_bench"


def write_batch(spark, b: int, src: str) -> None:
    """Like bench_stream_sft's fixture, plus cross-batch duplicates:
    even ids >= one batch in copy the conversation of (id - D + 1) --
    an odd id from the PREVIOUS batch, which is always original."""
    D = CONVS_PER_BATCH
    base_id = F.when(
        (F.col("id") % 2 == 0) & (F.col("id") >= D), F.col("id") - D + 1
    ).otherwise(F.col("id"))

    def word(j):
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base_id, F.lit(j)), F.lit(4096)).cast("string"),
        )

    def turn(role, content):
        return F.struct(F.lit(role).alias("role"), content.alias("content"))

    arr = F.array(
        turn("system", F.lit("Be concise.")),
        turn("user", F.concat_ws(" ", *[word(j) for j in range(8)])),
        turn("assistant", F.concat_ws(" ", *[word(j) for j in range(8, 24)])),
    )
    arr = F.when(
        base_id % 13 == 5,
        F.concat(arr, F.array(turn("user", F.lit("hello?")))),
    ).otherwise(arr)
    payload = F.when(
        base_id % 31 == 7, F.lit("{truncated upload")
    ).otherwise(F.to_json(arr))
    (
        spark.range(b * D, (b + 1) * D)
        .select(F.col("id").alias("conv_id"), payload.alias("conversation"))
        .write.mode("overwrite")
        .json(os.path.join(src, f"batch_{b}"))
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_stream_sft_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)
    src = os.path.join(ROOT, "src")
    os.makedirs(src)
    store = os.path.join(ROOT, "store")
    out = os.path.join(ROOT, "out")
    ck = os.path.join(ROOT, "ck")

    for b in range(N_BATCHES):
        write_batch(spark, b, src)

    def ingest(batch_df, epoch_id: int) -> None:
        parsed = parse_conversations(batch_df)
        valid = parsed.filter(_structural_flags(F.col("turns"))[-1])
        rendered = render_conversation(valid, id_col="conv_id")
        novel = incremental_exact_dedup(
            rendered, store, id_col="conv_id", batch_id=int(epoch_id)
        )
        (
            conversation_turns(valid.join(novel.select("conv_id"), "conv_id"))
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .partitionBy("__epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out)
        )

    stream = (
        spark.readStream.schema("conv_id long, conversation string")
        .option("maxFilesPerTrigger", str(32))
        .json(os.path.join(src, "batch_*"))
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ck)
        .start()
    )
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
    n_convs_kept = turns.select("conv_id").distinct().count()
    total = N_BATCHES * CONVS_PER_BATCH
    store_n = spark.read.parquet(store).count()
    entry = {
        "n_batches": N_BATCHES,
        "convs_per_batch": CONVS_PER_BATCH,
        "total_convs": total,
        "convs_admitted": n_convs_kept,
        "admitted_frac": round(n_convs_kept / total, 4),
        "store_fingerprints_final": store_n,
        "epochs_with_rows": len(epoch_walls),
        "epoch_walls_s": epoch_walls,
        "total_wall_s": total_wall,
        "convs_per_sec": round(total / total_wall, 1),
    }
    # from epoch 1 on, ~half of each batch duplicates the previous one:
    # overall admitted ~= valid_frac * (1 - dup_frac * 9/10) ~ 0.49
    assert 0.40 < entry["admitted_frac"] < 0.60, entry

    path = os.path.join(os.path.dirname(__file__), "STREAM_BENCH.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["sft_ingest_dedup_stream"] = entry
    with open(path, "w") as fh:
        json.dump(data, fh, indent=2)
        fh.write("\n")
    print(json.dumps({"sft_ingest_dedup_stream": entry}))


if __name__ == "__main__":
    main()
