"""Measured streaming incremental exact dedup: N micro-batches of
fresh+duplicate docs flow through ``streaming_incremental_dedup``
against a parquet fingerprint store that GROWS as the stream runs --
the continuous-crawl admission pipeline end to end (file source ->
foreachBatch anti-join -> store append + __epoch survivor partitions).

Each micro-batch: 100k docs, 50% exact dups of earlier batches' docs,
50% novel.  Reported: per-epoch wall, docs/s, and whether per-epoch
cost stays flat as the store grows (the O(batch + store-scan) claim;
the store holds ~50k more fingerprints per epoch).

Both store layouts run over the SAME staged batches:

- ``streaming_incremental_dedup``: parquet store, re-hashed (or
  broadcast) per epoch -> ``incremental_dedup_stream``.
- ``streaming_incremental_dedup_bucketed``: bucketed catalog store,
  zero store-side exchange per epoch ->
  ``incremental_dedup_stream_bucketed``.
- ``streaming_incremental_minhash_dedup``: NEAR-dup gate vs the band
  store (exact dups are near-dups at agreement 1.0, so survivors match
  the exact paths modulo random near-collisions among novel docs) ->
  ``incremental_dedup_stream_minhash``.

Writes all three keys into STREAM_BENCH.json.
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
    build_bucketed_fingerprint_store,
    build_minhash_band_store,
    streaming_incremental_dedup,
    streaming_incremental_dedup_bucketed,
    streaming_incremental_minhash_dedup,
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

    def run(start_query, out_dir, ck_dir, count_store) -> dict:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", str(32))  # one batch dir per epoch
            .json(os.path.join(src, "batch_*"))
        )
        q = start_query(stream, out_dir, ck_dir)
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
        n_surv = spark.read.parquet(out_dir).count()
        total_docs = N_BATCHES * DOCS_PER_BATCH
        return {
            "n_batches": N_BATCHES,
            "docs_per_batch": DOCS_PER_BATCH,
            "dup_frac_after_first": 0.5,
            "total_docs": total_docs,
            "survivors": n_surv,
            "store_fingerprints_final": count_store(),
            "epochs_with_rows": len(epoch_walls),
            "epoch_walls_s": epoch_walls,
            "total_wall_s": total_wall,
            "docs_per_sec": round(total_docs / total_wall, 1),
        }

    entry = run(
        lambda s, o, c: streaming_incremental_dedup(s, store, o, c),
        out, ck,
        lambda: spark.read.parquet(store).count(),
    )

    # same batches, bucketed catalog store (zero store-side exchange)
    spark.sql("DROP TABLE IF EXISTS fp_sdd_bench_t")
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    build_bucketed_fingerprint_store(
        spark.createDataFrame([], "doc_id long, text string"),
        "fp_sdd_bench_t", os.path.join(ROOT, "store_bkt"),
        n_buckets=n_buckets, epoch=-1,
    )
    entry_bkt = run(
        lambda s, o, c: streaming_incremental_dedup_bucketed(
            s, "fp_sdd_bench_t", o, c
        ),
        os.path.join(ROOT, "out_bkt"), os.path.join(ROOT, "ck_bkt"),
        lambda: spark.table("fp_sdd_bench_t").count(),
    )
    entry_bkt["n_buckets"] = n_buckets
    spark.sql("DROP TABLE IF EXISTS fp_sdd_bench_t")

    # same batches, MinHash NEAR-dup gate vs the band store
    spark.sql("DROP TABLE IF EXISTS mh_sdd_bench_t")
    build_minhash_band_store(
        spark.createDataFrame([], "doc_id long, text string"),
        "mh_sdd_bench_t", os.path.join(ROOT, "store_mh"),
        n_buckets=n_buckets, epoch=-1,
    )
    entry_mh = run(
        lambda s, o, c: streaming_incremental_minhash_dedup(
            s, "mh_sdd_bench_t", o, c
        ),
        os.path.join(ROOT, "out_mh"), os.path.join(ROOT, "ck_mh"),
        lambda: (
            spark.catalog.refreshTable("mh_sdd_bench_t"),
            spark.table("mh_sdd_bench_t").select("doc_id").distinct().count(),
        )[1],
    )
    entry_mh["n_buckets"] = n_buckets
    spark.sql("DROP TABLE IF EXISTS mh_sdd_bench_t")

    # the COMPOSED crawl topology: ingest -> near-dup gate -> funnel
    # profile -> sink, all inside ONE streaming query (profile_path
    # rides the gate's foreachBatch; a second stream would re-scan the
    # source).  Overhead vs the bare gate = the profile's two narrow
    # aggregates per epoch.
    spark.sql("DROP TABLE IF EXISTS mh_sddp_bench_t")
    build_minhash_band_store(
        spark.createDataFrame([], "doc_id long, text string"),
        "mh_sddp_bench_t", os.path.join(ROOT, "store_mhp"),
        n_buckets=n_buckets, epoch=-1,
    )
    prof_dir = os.path.join(ROOT, "profile_mhp")
    entry_mhp = run(
        lambda s, o, c: streaming_incremental_minhash_dedup(
            s, "mh_sddp_bench_t", o, c, profile_path=prof_dir
        ),
        os.path.join(ROOT, "out_mhp"), os.path.join(ROOT, "ck_mhp"),
        lambda: (
            spark.catalog.refreshTable("mh_sddp_bench_t"),
            spark.table("mh_sddp_bench_t").select("doc_id").distinct().count(),
        )[1],
    )
    entry_mhp["n_buckets"] = n_buckets
    prof = spark.read.parquet(prof_dir)
    raw_total, adm_total = (
        prof.groupBy().pivot("stage", ["raw", "admitted"])
        .sum("n_docs").collect()[0]
    )
    entry_mhp["profile_epochs"] = prof.select("__epoch").distinct().count()
    entry_mhp["profile_raw_docs"] = raw_total
    entry_mhp["profile_admitted_docs"] = adm_total
    entry_mhp["profile_kept_frac"] = round(adm_total / raw_total, 4)
    spark.sql("DROP TABLE IF EXISTS mh_sddp_bench_t")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "STREAM_BENCH.json"
    )
    with open(path) as f:
        data = json.load(f)
    data["incremental_dedup_stream"] = entry
    data["incremental_dedup_stream_bucketed"] = entry_bkt
    data["incremental_dedup_stream_minhash"] = entry_mh
    data["incremental_dedup_stream_minhash_profiled"] = entry_mhp
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(entry))
    print(json.dumps(entry_bkt))
    print(json.dumps(entry_mh))
    print(json.dumps(entry_mhp))
    print("updated STREAM_BENCH.json")


if __name__ == "__main__":
    main()
