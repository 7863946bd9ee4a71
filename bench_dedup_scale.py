"""Measured MinHash-LSH text-dedup cost and recall at growing n.

The text-dedup stack's scale claims (map-only signatures, band-bucket
joins that never go all-pairs) were measured only at the driver corpus's
5,000 docs (NGRAM_PROBE.json); this bench runs the headline pipeline --
``minhash_signatures_text`` (k=16) -> ``lsh_candidate_pairs`` (4 bands x
4 rows) -> ``exact_dedup`` for comparison -- on synthetic corpora up to
10^6 documents with PLANTED near-duplicates, so both the wall-clock
growth and the recall of the banded configuration are on record.

Corpus: deterministic JVM-expression generation (no driver data, no
Python): each doc is ~50 words drawn from a 4,096-word vocabulary by
xxhash64(doc, position); every 20th doc is a near-copy of the previous
doc (same word sequence, last word replaced) -- shingle Jaccard ~0.9,
the regime banded LSH exists for.  Exact copies are planted every 40th
doc for the exact-dedup arm.

Writes DEDUP_SCALE.json:
  per n: signature+pair wall (median of 3), exact-dedup wall,
  candidate-pair count, planted near-dup recall
  (fraction of planted (i, i-1) pairs appearing in the candidates).

Run:  python bench_dedup_scale.py
      SPARK_GRAFT_DEDUP_SIZES=10000,100000 python bench_dedup_scale.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures_text,
)
from data_stream_flink_user_address_spark.session import get_spark

WORDS_PER_DOC = 50
VOCAB = 4096
NEAR_EVERY = 20   # doc i (i % 20 == 1) = near-copy of doc i-1
EXACT_EVERY = 40  # doc i (i % 40 == 2) = exact copy of doc i-1
DATA_ROOT = "/tmp/dedup_scale_data"
SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_DEDUP_SIZES", "10000,100000,300000,1000000"
    ).split(",")
]


def gen_corpus(spark, n: int) -> str:
    """Docs from pure expressions.  Word j of doc i is
    w<xxhash64(base, j) % VOCAB> where base is the doc being copied
    (i-1 for planted rows, i otherwise); near-copies replace the last
    word, exact copies replace nothing."""
    path = os.path.join(DATA_ROOT, f"n{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        is_near = (F.col("id") % NEAR_EVERY == 1) & (F.col("id") > 0)
        is_exact = (F.col("id") % EXACT_EVERY == 2) & (F.col("id") > 1)
        base = F.when(is_near | is_exact, F.col("id") - 1).otherwise(F.col("id"))
        word = lambda b, j: F.concat(  # noqa: E731
            F.lit("w"), (F.pmod(F.xxhash64(b, j), F.lit(VOCAB))).cast("string")
        )
        words = [word(base, F.lit(j)) for j in range(WORDS_PER_DOC - 1)]
        last = F.when(
            is_near, word(F.col("id") + 1_000_000_000, F.lit(WORDS_PER_DOC - 1))
        ).otherwise(word(base, F.lit(WORDS_PER_DOC - 1)))
        (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *words, last).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_dedup_scale")
    results = []
    for n in SIZES:
        docs = spark.read.parquet(gen_corpus(spark, n))
        n_runs = 3 if n <= 300_000 else 1

        def pipeline():
            sigs = minhash_signatures_text(docs, n=5, num_hashes=16)
            return lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)

        walls = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            pipeline().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        exact_dedup(docs).write.format("noop").mode("overwrite").save()
        exact_s = round(time.perf_counter() - t0, 3)

        # recall of planted near-pairs (i-1, i) among the candidates
        pairs = pipeline()
        planted = (
            spark.range(n)
            .filter((F.col("id") % NEAR_EVERY == 1) & (F.col("id") > 0))
            .select(
                (F.col("id") - 1).alias("doc_a"), F.col("id").alias("doc_b")
            )
        )
        n_planted = planted.count()
        found = planted.join(pairs, ["doc_a", "doc_b"], "left_semi").count()
        n_pairs = pairs.count()

        entry = {
            "n_docs": n,
            "minhash_lsh": {"runs": walls, "median": statistics.median(walls)},
            "exact_dedup_s": exact_s,
            "candidate_pairs": n_pairs,
            "planted_near_pairs": n_planted,
            "near_pair_recall": round(found / max(1, n_planted), 4),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)
    out = {
        "words_per_doc": WORDS_PER_DOC,
        "vocab": VOCAB,
        "num_hashes": 16,
        "bands": 4,
        "rows_per_band": 4,
        "shingle_n": 5,
        "sizes": results,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "DEDUP_SCALE.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print("wrote DEDUP_SCALE.json")


if __name__ == "__main__":
    main()
