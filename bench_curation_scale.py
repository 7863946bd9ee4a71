"""Measured end-to-end curation-pipeline cost at growing corpus size.

``curation_pipeline`` (lang-ID + quality gate -> repetition cut ->
exact dedup -> benchmark decontamination -> mixture sample, ONE
declarative plan) is the engine's flagship training-data recipe; at the
driver corpus it processes 5,000 docs.  This bench runs the identical
composition on synthetic ENGLISH-shaped corpora (every 4th word an
English stopword so the language gate passes; sentence punctuation so
the quality gate passes; planted exact duplicates every 20th doc) up to
10^6 documents and records wall time plus the kept-fraction, so the
"one pass of per-doc signals, then fingerprints only" plan shape has a
measured cost curve on record next to DEDUP_SCALE.json's pair stage.

Writes CURATION_SCALE.json.
Run:  python bench_curation_scale.py
      SPARK_GRAFT_CURATION_SIZES=10000,100000 python bench_curation_scale.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as em
from data_stream_flink_user_address_spark.session import get_spark

WORDS_PER_DOC = 50
VOCAB = 2048
DUP_EVERY = 20
DATA_ROOT = "/tmp/curation_scale_data"
SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_CURATION_SIZES", "10000,100000,300000,1000000"
    ).split(",")
]
STOP_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]


def gen_corpus(spark, n: int) -> str:
    """English-shaped docs from pure expressions: every 4th word is an
    English stopword (language_id passes), every 12th word ends a
    'sentence' with a period (quality_score passes), and every
    DUP_EVERY-th doc copies its predecessor (exact-dedup work)."""
    path = os.path.join(DATA_ROOT, f"n{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        is_dup = (F.col("id") % DUP_EVERY == 1) & (F.col("id") > 0)
        base = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
        stops = F.array(*[F.lit(w) for w in STOP_EN])
        words = []
        for j in range(WORDS_PER_DOC):
            h = F.xxhash64(base, F.lit(j))
            if j % 4 == 0:
                w = F.element_at(stops, (F.pmod(h, F.lit(len(STOP_EN))) + 1).cast("int"))
            else:
                w = F.concat(F.lit("word"), F.pmod(h, F.lit(VOCAB)).cast("string"))
            if j % 12 == 11:
                w = F.concat(w, F.lit("."))
            words.append(w)
        (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *words).alias("text"),
                F.lit("en").alias("lang"),
                F.concat(
                    F.lit("src"), F.pmod(F.col("id"), F.lit(10)).cast("string")
                ).alias("source"),
                F.lit(WORDS_PER_DOC * 6).cast("bigint").alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_curation_scale")
    qfn = em.queries()["curation_pipeline"]
    results = []
    for n in SIZES:
        sf_dir = gen_corpus(spark, n)
        # the query loads <sf_dir>/documents.parquet; symlink the corpus in
        doc_dir = os.path.join(DATA_ROOT, f"sf_n{n}")
        os.makedirs(doc_dir, exist_ok=True)
        link = os.path.join(doc_dir, "documents.parquet")
        if not os.path.exists(link):
            os.symlink(sf_dir, link)

        n_runs = 3 if n <= 300_000 else 1
        walls = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qfn(spark, doc_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        kept = qfn(spark, doc_dir).count()
        entry = {
            "n_docs": n,
            "runs": walls,
            "median": statistics.median(walls),
            "kept_docs": kept,
            "kept_frac": round(kept / n, 4),
            "docs_per_sec": round(n / statistics.median(walls), 0),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)
    out = {"words_per_doc": WORDS_PER_DOC, "dup_every": DUP_EVERY, "sizes": results}
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "CURATION_SCALE.json"
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print("wrote CURATION_SCALE.json")


if __name__ == "__main__":
    main()
