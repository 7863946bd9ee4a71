"""Incremental exact dedup vs a persisted fingerprint store
(VERDICT r12 ask #6): measures the per-batch cost of both store
layouts --

- ``incremental_exact_dedup``: plain ``__batch``-partitioned parquet
  store; the anti-join re-shuffles (or broadcasts) per batch.
- ``incremental_exact_dedup_bucketed``: store written ONCE as a
  bucketed catalog table (``build_bucketed_fingerprint_store``); the
  per-batch anti-join reads the bucket layout with zero store-side
  exchange (broadcast disabled here to simulate the
  store-too-large-to-broadcast regime the layout exists for).

Corpus: the same expression-generated docs as ``bench_dedup_scale``
(imported).  Store sizes from $SPARK_GRAFT_INCR_STORES (default 1e6
and 1e7 fingerprints); batch = 1e5 docs, half exact dups of store
docs, half novel.  The zero-exchange win grows with store size: the
plain path re-shuffles the WHOLE store per batch, the bucketed path
never moves it.  Results go into the
``incremental`` key of DEDUP_SCALE.json (the ``sizes`` section is
preserved).

Run:  python bench_incremental_dedup.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_dedup_scale import DATA_ROOT, gen_corpus
from data_stream_flink_user_address_spark.functions.dedup import (
    build_bucketed_fingerprint_store,
    build_fingerprint_store,
    incremental_exact_dedup,
    incremental_exact_dedup_bucketed,
)
from data_stream_flink_user_address_spark.session import get_spark

N_STORES = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_INCR_STORES", "1000000,10000000"
    ).split(",")
]
N_BATCH = 100_000
RUNS = 3


def measure(spark, n_store: int) -> dict:
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(gen_corpus(spark, n_store))

    # batch: 5e4 exact dups of store docs (offset ids) + 5e4 novel docs
    dup_half = (
        docs.filter(F.col("doc_id") < N_BATCH // 2)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    )
    novel_path = os.path.join(DATA_ROOT, "incremental_novel")
    if not os.path.exists(os.path.join(novel_path, "_SUCCESS")):
        word = lambda j: F.concat(  # noqa: E731
            F.lit("n"),
            F.pmod(F.xxhash64(F.col("id") + 7_000_000, F.lit(j)), F.lit(4096)).cast(
                "string"
            ),
        )
        (
            spark.range(N_BATCH // 2)
            .select(
                (F.col("id") + 3_000_000).alias("doc_id"),
                F.concat_ws(" ", *[word(j) for j in range(50)]).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(novel_path)
        )
    batch = dup_half.unionByName(spark.read.parquet(novel_path))
    batch.write.mode("overwrite").parquet(os.path.join(DATA_ROOT, "incremental_batch"))
    batch = spark.read.parquet(os.path.join(DATA_ROOT, "incremental_batch"))

    # --- plain parquet store ---
    store_path = os.path.join(DATA_ROOT, "incremental_store_parquet")
    shutil.rmtree(store_path, ignore_errors=True)
    t0 = time.perf_counter()
    build_fingerprint_store(docs, store_path, batch_id=0)
    parquet_build_s = round(time.perf_counter() - t0, 3)
    parquet_runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        incremental_exact_dedup(batch, store_path).write.format("noop").mode(
            "overwrite"
        ).save()
        parquet_runs.append(round(time.perf_counter() - t0, 3))

    # --- bucketed catalog-table store ---
    bucket_path = os.path.join(DATA_ROOT, "incremental_store_bucketed")
    spark.sql("DROP TABLE IF EXISTS incr_fp_store")
    shutil.rmtree(bucket_path, ignore_errors=True)
    t0 = time.perf_counter()
    build_bucketed_fingerprint_store(
        docs, "incr_fp_store", bucket_path, n_buckets=n_buckets
    )
    bucketed_build_s = round(time.perf_counter() - t0, 3)
    # a 1e6-row store STILL fits the 10 MB broadcast default; disable
    # broadcast so the measured shape is the billions-of-fingerprints
    # one (SMJ against in-place buckets vs full store re-shuffle)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    bucketed_runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        incremental_exact_dedup_bucketed(batch, "incr_fp_store").write.format(
            "noop"
        ).mode("overwrite").save()
        bucketed_runs.append(round(time.perf_counter() - t0, 3))
    # the plain path under the same no-broadcast regime (apples to
    # apples: both SMJ, one re-shuffles the store, one does not)
    parquet_noB_runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        incremental_exact_dedup(batch, store_path).write.format("noop").mode(
            "overwrite"
        ).save()
        parquet_noB_runs.append(round(time.perf_counter() - t0, 3))

    survivors = incremental_exact_dedup_bucketed(batch, "incr_fp_store").count()
    spark.sql("DROP TABLE IF EXISTS incr_fp_store")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    return {
        "store_fingerprints": n_store,
        "batch_docs": N_BATCH,
        "batch_dup_frac": 0.5,
        "survivors": survivors,
        "n_buckets": n_buckets,
        "parquet_store": {
            "build_s": parquet_build_s,
            "dedup_runs": parquet_runs,
            "dedup_median_s": statistics.median(parquet_runs),
        },
        "parquet_store_no_broadcast": {
            "dedup_runs": parquet_noB_runs,
            "dedup_median_s": statistics.median(parquet_noB_runs),
        },
        "bucketed_store": {
            "build_s": bucketed_build_s,
            "dedup_runs": bucketed_runs,
            "dedup_median_s": statistics.median(bucketed_runs),
        },
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_incremental_dedup")
    entries = []
    for n_store in N_STORES:
        entry = measure(spark, n_store)
        entries.append(entry)
        print(json.dumps(entry), flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.path.join(here, "DEDUP_SCALE.json")
    with open(out_path) as f:
        data = json.load(f)
    data["incremental"] = entries
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print("updated DEDUP_SCALE.json")


if __name__ == "__main__":
    main()
