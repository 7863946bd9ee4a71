"""Incremental re-crawl demo: corpus_diff turns snapshot deltas into
an incremental curation run that provably converges to the full
reprocess.

1. snapshot A (the sf documents table) runs the full gate (markup
   strip -> quality signals -> keep rule) and lands as the curated
   corpus, partitioned for pruning;
2. snapshot B simulates a re-crawl: ~1% of pages gone, ~1% new, ~2%
   edited;
3. corpus_diff(A, B) classifies every id on a slim (id, md5) join --
   the unchanged bulk (~96%) is identified WITHOUT re-reading its
   text;
4. the incremental run re-gates ONLY added+changed docs, drops
   removed ids, and merges with the untouched survivors;
5. convergence check: the merged corpus equals gating snapshot B from
   scratch (one code path, two execution strategies -- the batch
   mirror of the streaming gates' replay contract).

Run: ``python examples/run_incremental_recrawl.py [sf_dir]``
(default /root/testdata/sf0.01; writes under /tmp/spark_graft_recrawl).
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.curation import (
    gopher_quality_flags,
)
from data_stream_flink_user_address_spark.functions.profile import corpus_diff
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.sources.tables import load_table

OUT = "/tmp/spark_graft_recrawl"


def gate(docs):
    """The curation gate both runs share: Gopher rule flags."""
    flags = gopher_quality_flags(docs).select("doc_id", "keep")
    return docs.join(flags, "doc_id").filter("keep").drop("keep")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-recrawl")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)

    snap_a = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = snap_a.count()

    # snapshot B: 1% removed, 2% edited, 1% added (new ids)
    snap_b = (
        snap_a.filter(F.col("doc_id") % 100 != 0)
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 100).isin(1, 2),
                F.concat(F.col("text"), F.lit(" freshly recrawled text")),
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            snap_a.filter(F.col("doc_id") % 100 == 3).select(
                (F.col("doc_id") + 10 * n).alias("doc_id"), "text"
            )
        )
    )

    # epoch 0: full gate of snapshot A
    curated_a = gate(snap_a)
    curated_a.write.mode("overwrite").parquet(os.path.join(OUT, "corpus_a"))
    curated_a = spark.read.parquet(os.path.join(OUT, "corpus_a"))

    # epoch 1: diff-driven incremental run
    diff = corpus_diff(snap_a, snap_b)
    by_status = {
        r.status: r.n
        for r in diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    todo_ids = diff.filter(F.col("status").isin("added", "changed")).select(
        "doc_id"
    )
    gone_ids = diff.filter(F.col("status") == "removed").select("doc_id")
    # only the delta's text is re-read and re-gated
    regated = gate(snap_b.join(F.broadcast(todo_ids), "doc_id"))
    merged = (
        curated_a.join(F.broadcast(gone_ids), "doc_id", "left_anti")
        .join(F.broadcast(todo_ids), "doc_id", "left_anti")  # stale versions out
        .unionByName(regated)
    )
    merged.write.mode("overwrite").parquet(os.path.join(OUT, "corpus_b"))

    # convergence: incremental == full reprocess of snapshot B
    full_b = {r.doc_id for r in gate(snap_b).select("doc_id").collect()}
    incr_b = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(OUT, "corpus_b"))
        .select("doc_id").collect()
    }
    ok = full_b == incr_b
    print(f"snapshot A: {n} docs -> curated {curated_a.count()}")
    print(f"re-crawl diff: {by_status}")
    print(f"incremental work: {todo_ids.count()} docs re-gated "
          f"({100.0 * todo_ids.count() / max(n, 1):.1f}% of the corpus)")
    print(f"incremental corpus: {len(incr_b)} docs -- "
          + ("CONVERGED with full reprocess" if ok else "MISMATCH"))
    assert ok, (len(full_b), len(incr_b))
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
