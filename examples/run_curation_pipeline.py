"""Runnable demo of the training-data curation recipe on the testdata.

The engine-extension counterpart of ``run_reference_topology.py``:
drives the composed ``curation_pipeline`` query (language-ID + quality
gate -> word-repetition cut -> exact dedup -> benchmark decontamination
-> deterministic mixture sample) over the driver's documents table and
prints a per-stage funnel so the recipe's selectivity is visible, plus
the train/valid/test split of the survivors.

Run: ``python examples/run_curation_pipeline.py [sf_dir]``
(default sf_dir: /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from data_stream_flink_user_address_spark.functions.curation import repetition_stats
from data_stream_flink_user_address_spark.functions.sampling import hash_split
from data_stream_flink_user_address_spark.functions.text import (
    language_id,
    quality_score,
    tokens,
)
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents", spread=True)
    n_all = docs.count()

    scored = (
        docs.withColumn("__toks", tokens("text"))
        .withColumn("lang", language_id("text"))
        .withColumn("quality", quality_score("text"))
    )
    n_lang_quality = scored.filter(
        (F.col("lang") == "en") & (F.col("quality") >= 0.5)
    ).count()
    rep = repetition_stats(docs)
    n_low_rep = rep.filter(F.col("dup_token_frac") <= 0.6).count()

    survivors = entry.queries()["curation_pipeline"](spark, sf_dir)
    survivors = survivors.cache()
    n_out = survivors.count()

    print(f"corpus:                      {n_all:6d} docs ({sf_dir})")
    print(f"lang=en AND quality>=0.5:    {n_lang_quality:6d} pass that gate alone")
    print(f"dup_token_frac<=0.6:         {n_low_rep:6d} pass that gate alone")
    print(f"full pipeline survivors:     {n_out:6d} "
          "(gates AND dedup AND decontaminate AND mixture)")

    mix = (
        survivors.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source")
    )
    print("\nmixture by source (src0-3 keep 1.0, src4-9 keep 0.4, rest 0.1):")
    for r in mix.collect():
        print(f"  {r['source']:>6s}: {r['n']}")

    split = (
        hash_split(survivors, {"train": 0.8, "valid": 0.1, "test": 0.1}, seed=42)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).orderBy("split")
    )
    print("\ntrain/valid/test split of survivors (deterministic, replay-safe):")
    for r in split.collect():
        print(f"  {r['split']:>5s}: {r['n']}")

    survivors.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
