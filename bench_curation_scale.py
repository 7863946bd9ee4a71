"""Measured end-to-end curation-pipeline cost at growing corpus size.

``curation_pipeline`` (lang-ID + quality + repetition gates ->
benchmark decontamination -> substring MARK+CUT -> exact dedup of the
cut text -> mixture sample, ONE declarative plan) is the engine's
flagship training-data recipe; at the driver corpus it processes 5,000
docs.  This bench runs the identical composition on synthetic
ENGLISH-shaped corpora (every 4th word an English stopword so the
language gate passes; sentence punctuation so the quality gate passes;
planted exact duplicates every 20th doc) up to 10^6 documents and
records wall time plus the kept-fraction, so the "one pass of per-doc
signals, then fingerprints only" plan shape has a measured cost curve
on record next to DEDUP_SCALE.json's pair stage.

r18 (VERDICT r17 ask #4): the composite gained the Lee-et-al mark+cut
stage, so each rung ALSO times a no-cut twin (the pre-r18 composition)
and records ``cut_marginal_s`` -- the cut stage's measured marginal
cost.  Ground-truth note: the planted every-20th-doc exact duplicates
are fully 8-gram-flagged on BOTH sides by the mark stage, so both
copies cut to empty text and exact dedup then keeps ONE empty survivor
corpus-wide -- kept_frac drops by ~1/20 vs the no-cut twin, exactly
the planted-dup arithmetic.

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


def _no_cut_pipeline(spark, sf_dir):
    """The pre-r18 composition (no substring mark+cut): the twin that
    measures the cut stage's marginal cost.  Kept in lock-step with
    _q_curation_pipeline minus the cut: gates -> decontaminate ->
    exact dedup of the ORIGINAL text -> mixture."""
    from pyspark.sql import Window

    from data_stream_flink_user_address_spark.functions.curation import (
        word_ngrams,
    )
    from data_stream_flink_user_address_spark.functions.sampling import (
        mixture_sample,
    )
    from data_stream_flink_user_address_spark.functions.text import (
        doc_fingerprint,
        language_id,
        quality_score,
        tokens,
    )

    d = em._docs(spark, sf_dir).withColumn("__toks", tokens("text"))
    sig = d.select(
        "doc_id",
        "source",
        language_id("text").alias("lang"),
        quality_score("text").alias("quality"),
        doc_fingerprint("text").alias("fingerprint"),
        F.when(
            F.size("__toks") > 0,
            F.round(
                1.0 - F.size(F.array_distinct("__toks")) / F.size("__toks"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        F.array_distinct(word_ngrams(F.col("__toks"), em._CONTAM_N)).alias(
            "__grams"
        ),
    )
    bench_grams = (
        sig.filter(F.col("doc_id") % em._CONTAM_BENCH_MOD == 0)
        .select(F.explode("__grams").alias("gram"))
        .distinct()
    )
    kept0 = sig.filter(
        (F.col("doc_id") % em._CONTAM_BENCH_MOD != 0)
        & (F.col("lang") == "en")
        & (F.col("quality") >= 0.5)
        & (F.col("dup_token_frac") <= 0.6)
    )
    contaminated_ids = (
        kept0.select("doc_id", F.explode("__grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    kept = kept0.join(contaminated_ids, "doc_id", "left_anti").drop("__grams")
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    deduped = kept.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return mixture_sample(
        deduped, em._MIX_FRACTIONS, default_fraction=em._MIX_DEFAULT, seed=42
    ).select("doc_id", "source", "quality", "dup_token_frac")


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
        nocut_walls = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            _no_cut_pipeline(spark, doc_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            nocut_walls.append(round(time.perf_counter() - t0, 3))
        kept = qfn(spark, doc_dir).count()
        med = statistics.median(walls)
        med_nc = statistics.median(nocut_walls)
        entry = {
            "n_docs": n,
            "runs": walls,
            "median": med,
            "nocut_runs": nocut_walls,
            "nocut_median": med_nc,
            "cut_marginal_s": round(med - med_nc, 3),
            "kept_docs": kept,
            "kept_frac": round(kept / n, 4),
            "docs_per_sec": round(n / med, 0),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)
    # merge by n_docs so a partial run (e.g. a single added 1e7 rung via
    # SPARK_GRAFT_CURATION_SIZES) extends the committed ladder instead
    # of truncating it
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "CURATION_SCALE.json"
    )
    merged = {s["n_docs"]: s for s in results}
    if os.path.exists(path):
        with open(path) as f:
            for s in json.load(f).get("sizes", []):
                merged.setdefault(s["n_docs"], s)
    out = {
        "words_per_doc": WORDS_PER_DOC,
        "dup_every": DUP_EVERY,
        "sizes": [merged[n] for n in sorted(merged)],
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote CURATION_SCALE.json")


if __name__ == "__main__":
    main()
