"""End-to-end STREAMING curation with kill/restart convergence.

The batch ``curation_pipeline`` recipe (see
``examples/run_curation_pipeline.py``) running as a Structured
Streaming job: a file-source stream of documents flows through the
SAME column-level stages -- one-projection signals (language-ID,
quality, content fingerprint, dup-token fraction, contamination
grams), row-local gates, benchmark decontamination, stateful exact
dedup, deterministic mixture sampling -- into the transactional keyed
upsert sink.  One code path serves backfill and the live feed; only
the dedup swaps implementation (``dropDuplicates`` state instead of a
window over a shuffle).

The demo stages the sf documents table as three JSONL batches, KILLS
the query after the second, restarts from the same checkpoint, feeds
the third, and proves convergence: the sink's surviving fingerprint
set must equal the batch recomputation's exactly.  Recovery crosses
the dedup state, the file-source offsets, AND the sink's idempotent
replay (the restarted first micro-batch re-commits rows the killed run
already upserted).

Per-doc decontamination here is a row-local ``arrays_overlap`` against
the DRIVER-COLLECTED eval-gram set baked into the plan -- eval
benchmarks are small and known upfront, so the stream needs no
aggregation over them (the batch recipe's broadcast anti-join and this
literal array are the same "eval grams ride to every executor" shape).
Streaming dedup state is unbounded here, matching the batch semantics
over a finite replay; a continuously-ingesting deployment would bound
it with ``streaming_dedup``'s ``dropDuplicatesWithinWatermark`` path.

Run: ``python examples/run_streaming_curation.py [sf_dir]``
(default sf_dir: /root/testdata/sf0.01; work dir is a fresh tmpdir)
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_stream_flink_user_address_spark.functions.curation import word_ngrams
from data_stream_flink_user_address_spark.functions.sampling import mixture_sample
from data_stream_flink_user_address_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    tokens,
)
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.sources.tables import load_table
from data_stream_flink_user_address_spark.streaming.sinks import (
    TransactionalKeyedUpsertSink,
)

# same knobs as the batch curation_pipeline query (__spark_entry__.py)
BENCH_MOD = 25          # every 25th doc stands in for the held-out eval set
CONTAM_N = 5            # word n-gram width for the overlap check
MIX_FRACTIONS = {**{f"src{i}": 1.0 for i in range(4)},
                 **{f"src{i}": 0.4 for i in range(4, 10)}}
MIX_DEFAULT = 0.1

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def curate(docs, bench_gram_lit):
    """The curation plan on ANY frame (batch or stream): one-projection
    signals, row-local gates, literal-array decontamination, then the
    deterministic mixture filter.  Dedup is appended by the caller
    (dropDuplicates on a stream, min-id window in batch)."""
    sig = docs.withColumn("__toks", tokens("text")).select(
        "doc_id",
        "source",
        language_id("text").alias("lang"),
        quality_score("text").alias("quality"),
        doc_fingerprint("text").alias("fingerprint"),
        F.when(
            F.size("__toks") > 0,
            F.round(1.0 - F.size(F.array_distinct("__toks")) / F.size("__toks"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        F.array_distinct(word_ngrams(F.col("__toks"), CONTAM_N)).alias("__grams"),
    )
    gated = sig.filter(
        (F.col("doc_id") % BENCH_MOD != 0)
        & (F.col("lang") == "en")
        & (F.col("quality") >= 0.5)
        & (F.col("dup_token_frac") <= 0.6)
        & ~F.arrays_overlap(F.col("__grams"), bench_gram_lit)
    ).drop("__grams")
    return mixture_sample(gated, MIX_FRACTIONS, default_fraction=MIX_DEFAULT, seed=42)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("streaming-curation-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="streaming_curation_")
    src = os.path.join(work, "in")
    out = os.path.join(work, "table")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text", "source"
    )

    # the eval set is static and small: collect its distinct grams once
    # and bake them into the plan as a literal array
    bench_grams = [
        r["gram"]
        for r in docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .withColumn("__toks", tokens("text"))
        .select(F.explode(F.array_distinct(word_ngrams(F.col("__toks"), CONTAM_N))).alias("gram"))
        .distinct()
        .collect()
    ]
    gram_lit = F.array(*[F.lit(g) for g in bench_grams]) if bench_grams else F.array().cast("array<string>")
    print(f"eval-gram set: {len(bench_grams)} grams from every {BENCH_MOD}th doc")

    # stage the corpus as three JSONL batches
    rows = [r.asDict() for r in docs.collect()]
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    for i, chunk in enumerate(thirds[:2]):
        with open(os.path.join(src, f"batch{i}.json"), "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")

    sink = TransactionalKeyedUpsertSink(spark, out, key="doc_id")

    def start_query():
        stream = spark.readStream.schema(SCHEMA).json(src)
        curated = curate(stream, gram_lit).dropDuplicates(["fingerprint"])
        return (
            curated.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink.foreach_batch())
            .start()
        )

    q = start_query()
    q.processAllAvailable()
    mid = sink.read()
    n_mid = mid.count() if mid is not None else 0
    q.stop()  # kill mid-run
    print(f"after batches 1+2 and KILL:  {n_mid:6d} docs in the sink")

    with open(os.path.join(src, "batch2.json"), "w") as f:
        for r in thirds[2]:
            f.write(json.dumps(r) + "\n")

    q = start_query()  # resume from the same checkpoint
    q.processAllAvailable()
    q.stop()
    final = sink.read()
    got = {r["fingerprint"] for r in final.select("fingerprint").collect()}
    n_final = final.count()
    print(f"after restart + batch 3:     {n_final:6d} docs in the sink")

    # batch twin on the full corpus: same stages, dedup keeps one row
    # per fingerprint -- compare the surviving fingerprint SET (which
    # copy survives is arrival-order on the stream, min-id in batch)
    want = {
        r["fingerprint"]
        for r in curate(docs, gram_lit)
        .dropDuplicates(["fingerprint"])
        .select("fingerprint")
        .collect()
    }
    assert got == want, (
        f"divergence: {len(got - want)} extra, {len(want - got)} missing"
    )
    assert n_final == len(want), "sink holds duplicate fingerprints"
    print(f"batch recomputation:         {len(want):6d} docs -- CONVERGED")
    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
