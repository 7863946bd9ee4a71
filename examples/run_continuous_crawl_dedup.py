"""Continuous-crawl exact dedup demo: a document stream gated against a
PERSISTED fingerprint store that outlives the query, with a mid-run
kill/restart proving history is store-backed, not state-backed.

Shape (functions/dedup.py:streaming_incremental_dedup): each
micro-batch anti-joins the store (O(batch + store-scan), 32-byte
fingerprints only), appends its survivors' fingerprints under
``__batch=<base+epoch>``, and writes survivor rows under
``__epoch=<epoch>`` -- both dynamic-partition overwrites, so epoch
replays after a crash rewrite exactly their own partitions.  Because
history lives in parquet, a BRAND-NEW query (fresh checkpoint, fresh
session state) still rejects every document the dead query admitted --
the property ``dropDuplicates`` streaming state cannot offer.

The demo:
1. seeds the store with the sf corpus's even-id docs,
2. streams three staged batches (each mixing novel docs, exact dups of
   the seed, and dups of EARLIER batches' survivors),
3. kills the query after batch 2, restarts, feeds batch 3,
4. prints per-stage admitted counts and verifies the final survivor
   set equals the batch operator run over the same replay.

Run: ``python examples/run_continuous_crawl_dedup.py [sf_dir] [--bucketed]``
(default sf_dir: /root/testdata/sf0.01; work dir is a fresh tmpdir)

``--bucketed`` swaps the parquet store for the BUCKETED catalog table
(functions/dedup.py:streaming_incremental_dedup_bucketed): identical
kill/restart semantics, but every epoch's anti-join co-locates against
the store's on-disk bucketing with zero store-side exchange -- the
layout for stores too large to re-shuffle per micro-batch -- and the
demo closes with compact_bucketed_fingerprint_store reclaiming the
append-only layout's slack.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.dedup import (
    build_bucketed_fingerprint_store,
    build_fingerprint_store,
    compact_bucketed_fingerprint_store,
    streaming_incremental_dedup,
    streaming_incremental_dedup_bucketed,
)
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.sources.tables import load_table


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--bucketed"]
    bucketed = "--bucketed" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    work = tempfile.mkdtemp(prefix="crawl_dedup_")
    src = os.path.join(work, "src")
    store = os.path.join(work, "store")
    out = os.path.join(work, "out")
    ck = os.path.join(work, "ck")
    os.makedirs(src)

    spark = get_spark("continuous-crawl-dedup")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # 1. seed the store with the even-id half of the corpus
    table = "crawl_demo_fp_t"
    if bucketed:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        build_bucketed_fingerprint_store(
            docs.filter(F.col("doc_id") % 2 == 0), table, store,
            n_buckets=int(spark.conf.get("spark.sql.shuffle.partitions")),
            epoch=-1,
        )
        n_seed = spark.table(table).count()
    else:
        build_fingerprint_store(docs.filter(F.col("doc_id") % 2 == 0), store)
        n_seed = spark.read.parquet(store).count()
    layout = "bucketed catalog table" if bucketed else "parquet"
    print(f"seeded store:            {n_seed:6d} fingerprints ({layout})")

    # stage three JSONL batches:
    #   b1: odd ids 1..199 (novel) + even ids 0..98 (dups of the seed)
    #   b2: odd ids 201..399 (novel) + odd ids 1..99 (dups of b1)
    #   b3: odd ids 401..599 (novel) + odd ids 201..299 (dups of b2)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    batches = [
        odd.filter(F.col("doc_id") < 200).unionByName(
            even.filter(F.col("doc_id") < 100)
        ),
        odd.filter(F.col("doc_id").between(201, 399)).unionByName(
            odd.filter(F.col("doc_id") < 100)
            .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
        ),
        odd.filter(F.col("doc_id").between(401, 599)).unionByName(
            odd.filter(F.col("doc_id").between(201, 299))
            .select((F.col("doc_id") + 20_000).alias("doc_id"), "text")
        ),
    ]
    for i, b in enumerate(batches, start=1):
        b.coalesce(1).write.mode("overwrite").json(
            os.path.join(work, f"stage_b{i}")
        )

    def feed(i: int) -> None:
        stage = os.path.join(work, f"stage_b{i}")
        for j, f in enumerate(p for p in os.listdir(stage) if p.endswith(".json")):
            shutil.copy(
                os.path.join(stage, f), os.path.join(src, f"b{i}_{j}.json")
            )

    stream_of = lambda: spark.readStream.schema(  # noqa: E731
        "doc_id long, text string"
    ).json(src)

    def start_query():
        if bucketed:
            return streaming_incremental_dedup_bucketed(
                stream_of(), table, out, ck
            )
        return streaming_incremental_dedup(stream_of(), store, out, ck)

    def store_fps() -> int:
        if bucketed:
            # the stream's foreachBatch runs in a CLONED session; its
            # insertInto appends refresh the clone's relation cache,
            # not this session's -- observers must refresh the table
            spark.catalog.refreshTable(table)
            src_df = spark.table(table)
        else:
            src_df = spark.read.parquet(store)
        return src_df.select("fingerprint").distinct().count()

    # 2. run batches 1-2, then KILL the query
    q = start_query()
    feed(1)
    q.processAllAvailable()
    feed(2)
    q.processAllAvailable()
    q.stop()
    admitted_12 = spark.read.parquet(out).count()
    print(f"admitted after b1+b2:    {admitted_12:6d} docs (query killed here)")

    # 3. fresh query, SAME store + checkpoint: history must hold
    q2 = start_query()
    feed(3)
    q2.processAllAvailable()
    q2.stop()

    survivors = spark.read.parquet(out)
    n_out = survivors.count()
    n_store = store_fps()
    print(f"admitted after restart:  {n_out:6d} docs")
    print(f"store fingerprints:      {n_store:6d} (= seed + admitted)")
    assert n_store == n_seed + n_out, (n_store, n_seed, n_out)

    # 4. ground truth: every admitted doc's text is unique and unseen --
    # recompute from the staged batches with plain batch ops
    replay = batches[0].unionByName(batches[1]).unionByName(batches[2])
    fp = F.md5(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    seen = even.select(fp.alias("f")).distinct()
    expect = (
        replay.select("doc_id", fp.alias("f"))
        .groupBy("f")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(seen, "f", "left_anti")
        .count()
    )
    ok = expect == n_out
    print(f"batch recomputation:     {expect:6d} docs -- "
          + ("CONVERGED" if ok else "MISMATCH"))
    assert ok

    # 5. bucketed maintenance: compact the append-only store
    if bucketed:
        before, after = compact_bucketed_fingerprint_store(
            spark, table, f"{table}_c", os.path.join(work, "store_c")
        )
        print(f"compacted store:         {before:6d} rows -> {after:6d}")
        assert after == n_store
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_c")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
