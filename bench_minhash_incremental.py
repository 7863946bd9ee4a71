"""Incremental MinHash near-dup gate vs a persisted band store: the
per-batch cost of ``incremental_minhash_dedup`` against a
``build_minhash_band_store`` table (broadcast disabled -- the measured
shape is the corpus-too-large-to-broadcast one where the store's bucket
layout is the whole point).

Corpus: the bench_dedup_scale expression-generated docs.  Batch =
1e5 docs, half near-dups of store docs (one appended token -- MinHash
mins are typically unchanged, so the gate must catch them), half novel.
Reported per store size: store build, per-batch gate medians, survivor
count, and the caught fraction of the planted near-dup half.

Writes the ``minhash_incremental`` key of DEDUP_SCALE.json (other keys
preserved).  Run:  python bench_minhash_incremental.py
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
    build_minhash_band_store,
    incremental_minhash_dedup,
)
from data_stream_flink_user_address_spark.session import get_spark

N_STORES = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_MH_STORES", "1000000").split(",")
]
N_BATCH = 100_000
RUNS = 3


def measure(spark, n_store: int) -> dict:
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(gen_corpus(spark, n_store))

    # batch: 5e4 near-dups of store docs (one appended token, offset
    # ids) + 5e4 novel docs
    near_half = (
        docs.filter(F.col("doc_id") < N_BATCH // 2)
        .select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
    )
    word = lambda j: F.concat(  # noqa: E731
        F.lit("n"),
        F.pmod(F.xxhash64(F.col("id") + 9_000_000, F.lit(j)), F.lit(4096)).cast(
            "string"
        ),
    )
    novel = spark.range(N_BATCH // 2).select(
        (F.col("id") + 3_000_000).alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(50)]).alias("text"),
    )
    batch_path = os.path.join(DATA_ROOT, "mh_incremental_batch")
    # balance the files: the filter+union otherwise lands the whole
    # near-dup half in two fat parquet files, and the map-only
    # signature stage (higher-order md5 per shingle) waits on that
    # straggler task -- measured 27 s vs 12 s for the same rows
    near_half.unionByName(novel).repartition(n_buckets).write.mode(
        "overwrite"
    ).parquet(batch_path)
    batch = spark.read.parquet(batch_path)

    store_path = os.path.join(DATA_ROOT, "mh_incremental_store")
    spark.sql("DROP TABLE IF EXISTS incr_mh_store")
    shutil.rmtree(store_path, ignore_errors=True)
    t0 = time.perf_counter()
    build_minhash_band_store(
        docs, "incr_mh_store", store_path, n_buckets=n_buckets, epoch=-1
    )
    build_s = round(time.perf_counter() - t0, 3)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        incremental_minhash_dedup(batch, "incr_mh_store").write.format(
            "noop"
        ).mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    survivors = incremental_minhash_dedup(batch, "incr_mh_store")
    n_surv = survivors.count()
    # planted near-dups carry ids >= 2e6 and < 3e6; any surviving is a miss
    missed = survivors.filter(
        (F.col("doc_id") >= 2_000_000) & (F.col("doc_id") < 3_000_000)
    ).count()
    spark.sql("DROP TABLE IF EXISTS incr_mh_store")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    return {
        "store_docs": n_store,
        "store_band_rows": n_store * 4,
        "batch_docs": N_BATCH,
        "planted_near_frac": 0.5,
        "survivors": n_surv,
        "planted_caught_frac": round(1 - missed / (N_BATCH // 2), 4),
        "n_buckets": n_buckets,
        "build_s": build_s,
        "gate_runs": runs,
        "gate_median_s": statistics.median(runs),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_minhash_incremental")
    results = [measure(spark, n) for n in N_STORES]
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "DEDUP_SCALE.json"
    )
    with open(path) as f:
        data = json.load(f)
    # merge by store size so partial env-var runs extend, not erase
    by_size = {
        r["store_docs"]: r for r in data.get("minhash_incremental", [])
    }
    by_size.update({r["store_docs"]: r for r in results})
    data["minhash_incremental"] = [by_size[k] for k in sorted(by_size)]
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(results))
    print("updated DEDUP_SCALE.json")


if __name__ == "__main__":
    main()
