"""Measured cost of the r12 curation operators at growing corpus size.

Times boilerplate_line_dedup, per_source_cap, quality_stratified_buckets,
strip_markup, and overlap_chunks on the English-shaped curation corpora
(bench_curation_scale, 10-source layout) at 10^4..10^6 docs.  The
claims under test: the row-local ops (strip, chunks) scale with scan
bytes only; per_source_cap's WindowGroupLimit keeps the source shuffle
bounded by cap x partitions; boilerplate's fingerprint-df pass never
ships line bodies.

Writes R12_OPS_SCALE.json.
Run:  python bench_r12_ops_scale.py
      SPARK_GRAFT_R12_SIZES=10000,100000 python bench_r12_ops_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_curation_scale import gen_corpus
from data_stream_flink_user_address_spark.functions.dedup import (
    boilerplate_line_dedup,
)
from data_stream_flink_user_address_spark.functions.packing import overlap_chunks
from data_stream_flink_user_address_spark.functions.sampling import (
    per_source_cap,
    quality_stratified_buckets,
)
from data_stream_flink_user_address_spark.functions.text import strip_markup
from data_stream_flink_user_address_spark.session import get_spark

from pyspark.sql import functions as F

SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_R12_SIZES", "10000,100000,1000000"
    ).split(",")
]


def main() -> None:
    spark = get_spark("bench-r12-ops")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in SIZES:
        docs = spark.read.parquet(gen_corpus(spark, n))
        # multi-line variant for the line dedup (inject a shared banner
        # + per-class nav line, the entry-query shape)
        lined = docs.select(
            "doc_id",
            F.concat_ws(
                "\n", F.lit("BANNER"), F.col("text"),
                F.concat(F.lit("nav-"), (F.col("doc_id") % 5).cast("string")),
            ).alias("text"),
        )
        ops = {
            "strip_markup": lambda: strip_markup(docs),
            "overlap_chunks": lambda: overlap_chunks(
                docs, chunk_len=24, overlap=8
            ),
            "per_source_cap": lambda: per_source_cap(docs, cap=n // 20),
            "quality_buckets": lambda: quality_stratified_buckets(
                docs.select("doc_id", "source", "n_chars"), "n_chars",
                n_buckets=4,
            ),
            "boilerplate_line_dedup": lambda: boilerplate_line_dedup(
                lined, min_df=3
            ),
        }
        entry = {"n_docs": n}
        for name, make in ops.items():
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            entry[name + "_s"] = round(time.perf_counter() - t0, 2)
        rows.append(entry)
        print(json.dumps(entry))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "R12_OPS_SCALE.json"), "w") as f:
        json.dump({
            "note": "r12 curation ops on the 10-source English-shaped "
                    "curation corpora; cap = n/20 so per_source_cap always "
                    "binds (each source holds n/10 docs). local[*]",
            "sizes": rows,
        }, f, indent=1)


if __name__ == "__main__":
    main()
