"""Measured cost of the three quality-binning shapes at 1e6 docs with a
dominant (90%) source -- the skew regime VERDICT r12 wrong #2 called
out.  Per-stratum ntile is inherently single-task-per-stratum; the
question is what rides that task's sort:

- legacy (r12) shape: ``ntile`` over the FULL frame -- the dominant
  source's every row, text included, lands in one task's sort.
- r13 ``quality_stratified_buckets``: only (key, stratum, score) ride
  the window; bodies re-join on the key afterwards.
- ``quality_bucket_cuts``: no window at all -- mergeable
  approx-percentile cuts broadcast back, bucket assigned row-locally.

Writes R13_OPS_SCALE.json (key ``quality_buckets``).
Run:  python bench_quality_buckets.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench_curation_scale import gen_corpus
from data_stream_flink_user_address_spark.functions.sampling import (
    quality_bucket_cuts,
    quality_stratified_buckets,
)
from data_stream_flink_user_address_spark.session import get_spark

N_DOCS = int(os.environ.get("SPARK_GRAFT_QB_DOCS", "1000000"))
N_BUCKETS = 10
RUNS = 3


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_quality_buckets")
    docs = (
        spark.read.parquet(gen_corpus(spark, N_DOCS))
        # 90% of docs in one dominant source, hash-derived double score
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 10 < 9, F.lit("dominant")).otherwise(
                F.concat(F.lit("src"), (F.col("doc_id") % 10).cast("string"))
            ),
        )
        .withColumn(
            "score",
            (F.pmod(F.xxhash64("doc_id", F.lit(99)), F.lit(1_000_000)) / 1e6),
        )
    )

    def legacy(frame):
        w = (
            Window.partitionBy("source")
            .orderBy(F.col("score").asc(), F.col("doc_id").asc())
        )
        return frame.withColumn(
            "quality_bucket", F.ntile(N_BUCKETS).over(w).cast("bigint")
        )

    variants = {
        "legacy_full_row_ntile": lambda: legacy(docs),
        "r13_slim_window_rejoin": lambda: quality_stratified_buckets(
            docs, "score", n_buckets=N_BUCKETS
        ),
        "approx_cuts_broadcast": lambda: quality_bucket_cuts(
            docs, "score", n_buckets=N_BUCKETS
        ),
    }
    out = {"n_docs": N_DOCS, "n_buckets": N_BUCKETS, "dominant_source_frac": 0.9}
    for name, fn in variants.items():
        walls = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": walls, "median_s": statistics.median(walls)}
        print(json.dumps({name: out[name]}), flush=True)

    # sanity: the two exact shapes agree everywhere
    a = quality_stratified_buckets(docs, "score", n_buckets=N_BUCKETS).select(
        "doc_id", "quality_bucket"
    )
    b = legacy(docs).select("doc_id", "quality_bucket")
    out["exact_shapes_agree"] = (
        a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    )

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "R13_OPS_SCALE.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["quality_buckets"] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote R13_OPS_SCALE.json")


if __name__ == "__main__":
    main()
