"""Incremental SimHash near-dup gate vs a persisted band store: the
Hamming sibling of ``bench_minhash_incremental`` (broadcast disabled --
the store's bucket layout is the point).

Batch = 1e5 docs, half EXACT duplicates of store docs (hamming 0 -- the
pigeonhole gate must catch every one; one-token perturbations are not
planted because they legitimately straddle the max_hamming=3 boundary
on 50-token docs), half novel.  Reported per store size: store build,
per-batch gate medians, survivors, caught fraction of the planted half.

Signature width matters at this scale: at 32 bits a 1e6-doc store puts
random unrelated docs within hamming 3 of each other (birthday
collisions over C(n,2) pairs x ~5.5e3/2^32 per pair), measured
collapsing the novel half to 13k survivors -- so the bench runs the
web-scale dimensioning, BITS=48 (Google's production SimHash used 64),
where the same probability is ~2e-11 and survivors recover the planted
truth.  The registered sf-scale simhash queries keep the 32-bit
default; corpora past ~1e5 docs should raise ``bits``.

Writes the ``simhash_incremental`` key of DEDUP_SCALE.json (merged by
store size).  Run:  python bench_simhash_incremental.py
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
    build_simhash_band_store,
    incremental_simhash_dedup,
)
from data_stream_flink_user_address_spark.session import get_spark

N_STORES = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SH_STORES", "1000000").split(",")
]
N_BATCH = 100_000
RUNS = 3
BITS = int(os.environ.get("SPARK_GRAFT_SH_BITS", "48"))


def measure(spark, n_store: int) -> dict:
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(gen_corpus(spark, n_store))

    dup_half = (
        docs.filter(F.col("doc_id") < N_BATCH // 2)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
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
    batch_path = os.path.join(DATA_ROOT, "sh_incremental_batch")
    dup_half.unionByName(novel).repartition(n_buckets).write.mode(
        "overwrite"
    ).parquet(batch_path)
    batch = spark.read.parquet(batch_path)

    store_path = os.path.join(DATA_ROOT, "sh_incremental_store")
    spark.sql("DROP TABLE IF EXISTS incr_sh_store")
    shutil.rmtree(store_path, ignore_errors=True)
    t0 = time.perf_counter()
    build_simhash_band_store(
        docs, "incr_sh_store", store_path, n_buckets=n_buckets, epoch=-1,
        bits=BITS,
    )
    build_s = round(time.perf_counter() - t0, 3)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        incremental_simhash_dedup(
            batch, "incr_sh_store", bits=BITS
        ).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    survivors = incremental_simhash_dedup(batch, "incr_sh_store", bits=BITS)
    n_surv = survivors.count()
    missed = survivors.filter(
        (F.col("doc_id") >= 2_000_000) & (F.col("doc_id") < 3_000_000)
    ).count()
    spark.sql("DROP TABLE IF EXISTS incr_sh_store")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    return {
        "store_docs": n_store,
        "store_band_rows": n_store * 4,
        "batch_docs": N_BATCH,
        "bits": BITS,
        "planted_exact_frac": 0.5,
        "survivors": n_surv,
        "planted_caught_frac": round(1 - missed / (N_BATCH // 2), 4),
        "n_buckets": n_buckets,
        "build_s": build_s,
        "gate_runs": runs,
        "gate_median_s": statistics.median(runs),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_simhash_incremental")
    results = [measure(spark, n) for n in N_STORES]
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "DEDUP_SCALE.json"
    )
    with open(path) as f:
        data = json.load(f)
    by_size = {
        r["store_docs"]: r for r in data.get("simhash_incremental", [])
    }
    by_size.update({r["store_docs"]: r for r in results})
    data["simhash_incremental"] = [by_size[k] for k in sorted(by_size)]
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(results))
    print("updated DEDUP_SCALE.json")


if __name__ == "__main__":
    main()
