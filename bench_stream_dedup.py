"""Measured streaming incremental exact dedup: N micro-batches of
fresh+duplicate docs flow through ``streaming_incremental_dedup``
against a parquet fingerprint store that GROWS as the stream runs --
the continuous-crawl admission pipeline end to end (file source ->
foreachBatch anti-join -> store append + __epoch survivor partitions).

Each micro-batch: 100k docs, 50% exact dups of earlier batches' docs,
50% novel.  Reported: per-epoch wall, docs/s, and whether per-epoch
cost stays flat as the store grows (the O(batch + store-scan) claim;
the store holds ~50k more fingerprints per epoch).

Writes the ``incremental_dedup_stream`` key into STREAM_BENCH.json.
Run:  python bench_stream_dedup.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.dedup import (
    streaming_incremental_dedup,
)
from data_stream_flink_user_address_spark.session import get_spark

N_BATCHES = int(os.environ.get("SPARK_GRAFT_SDD_BATCHES", "10"))
DOCS_PER_BATCH = int(os.environ.get("SPARK_GRAFT_SDD_DOCS", "100000"))
ROOT = "/tmp/stream_dedup_bench"


def write_batch(spark, b: int, src: str) -> None:
    """Batch b: ids [b*D, (b+1)*D); docs with id % 2 == 0 duplicate the
    text of the ODD doc (id - D + 1) from the PREVIOUS batch (odd docs
    are always original, so the copied text really is in the store),
    odd ids are novel -- from batch 1 on, half of each batch is already
    seen."""
    D = DOCS_PER_BATCH
    base = F.when(
        (F.col("id") % 2 == 0) & (F.col("id") >= D), F.col("id") - D + 1
    ).otherwise(F.col("id"))
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(base, F.lit(j)), F.lit(4096)).cast("string")
    )
    (
        spark.range(b * D, (b + 1) * D)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[word(j) for j in range(30)]).alias("text"),
        )
        .write.mode("overwrite")
        .json(os.path.join(src, f"batch_{b}"))
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_stream_dedup")
    shutil.rmtree(ROOT, ignore_errors=True)
    src = os.path.join(ROOT, "src")
    os.makedirs(src)
    store = os.path.join(ROOT, "store")
    out = os.path.join(ROOT, "out")
    ck = os.path.join(ROOT, "ck")

    # stage all batch files up front so each epoch triggers on one dir
    for b in range(N_BATCHES):
        write_batch(spark, b, src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", str(32))  # one staged batch dir per epoch
        .json(os.path.join(src, "batch_*"))
    )
    q = streaming_incremental_dedup(stream, store, out, ck)
    epoch_walls: list[float] = []
    try:
        last_progress = 0
        t_all = time.perf_counter()
        q.processAllAvailable()
        total_wall = round(time.perf_counter() - t_all, 3)
        for p in q.recentProgress:
            if p["numInputRows"] > 0:
                epoch_walls.append(
                    round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
                )
        last_progress = len(epoch_walls)
    finally:
        q.stop()

    survivors = spark.read.parquet(out)
    n_surv = survivors.count()
    n_fp = spark.read.parquet(store).count()
    total_docs = N_BATCHES * DOCS_PER_BATCH
    entry = {
        "n_batches": N_BATCHES,
        "docs_per_batch": DOCS_PER_BATCH,
        "dup_frac_after_first": 0.5,
        "total_docs": total_docs,
        "survivors": n_surv,
        "store_fingerprints_final": n_fp,
        "epochs_with_rows": last_progress,
        "epoch_walls_s": epoch_walls,
        "total_wall_s": total_wall,
        "docs_per_sec": round(total_docs / total_wall, 1),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "STREAM_BENCH.json"
    )
    with open(path) as f:
        data = json.load(f)
    data["incremental_dedup_stream"] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(entry))
    print("updated STREAM_BENCH.json")


if __name__ == "__main__":
    main()
