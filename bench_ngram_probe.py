"""Candidate-stage probe for ngram_jaccard_pairs (VERDICT r5 item 6).

The exact-score ngram-Jaccard query is the slowest headline entry
(4.9-7.7 s at sf0.1).  Its cost splits into (a) the per-shingle
candidate self-join and (b) the per-candidate exact rescore
(array_intersect on the pair's full shingle sets).  This probe measures
where the rows actually are and whether requiring >= 2 shared low-df
shingles (``min_shared_shingles=2``) shrinks the rescore input without
losing any true pair:

- shingle document-frequency distribution (how much the df<=cap prune
  keeps, where the mass sits);
- candidate-pair count by number of shared low-df shingles (how many
  candidates the m=2 cut would drop);
- end-to-end timing (median of 3) at m=1 vs m=2 with otherwise
  identical knobs (n=5, threshold=0.25, max_shingle_freq=100 -- the
  declared headline configuration);
- exact output diff: pairs emitted at m=1 but not at m=2 (recall cost;
  precision is unaffected because scores are exact either way).

Writes NGRAM_PROBE.json and prints it.  Run on an otherwise idle box:
    python bench_ngram_probe.py
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
    ngram_jaccard_pairs,
    shingles,
)
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MAX_DF = 100
N = 5
THRESHOLD = 0.25


def main() -> None:
    spark = get_spark("ngram-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents", spread=True)
    out = {"sf_dir": SF_DIR, "n": N, "threshold": THRESHOLD, "max_df": MAX_DF}

    # -- 1. shingle df distribution ------------------------------------
    sh = shingles(docs, "text", "doc_id", N).cache()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).cache()
    row = freq.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("df") <= MAX_DF, 1).otherwise(0)).alias("n_low_df"),
        F.expr("percentile_approx(df, array(0.5, 0.9, 0.99, 1.0), 10000)").alias("q"),
        F.sum("df").alias("postings"),
        F.sum(F.when(F.col("df") <= MAX_DF, F.col("df")).otherwise(0)).alias(
            "postings_low_df"
        ),
    ).collect()[0]
    out["df_dist"] = {
        "n_shingles": row["n_shingles"],
        "n_low_df": row["n_low_df"],
        "df_p50_p90_p99_max": [float(x) for x in row["q"]],
        "postings_total": int(row["postings"]),
        "postings_low_df": int(row["postings_low_df"]),
    }

    # -- 2. candidates by number of shared low-df shingles -------------
    joinable = (
        sh.join(freq.filter(F.col("df") <= MAX_DF), "shingle")
        .select("doc_id", "shingle")
    )
    a = joinable.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = joinable.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    hist = {
        int(r["n_shared"]): int(r["cnt"])
        for r in shared.groupBy("n_shared")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n_cand_m1 = sum(hist.values())
    n_cand_m2 = sum(c for s, c in hist.items() if s >= 2)
    out["candidates"] = {
        "m1": n_cand_m1,
        "m2": n_cand_m2,
        "m2_shrink_pct": round(100 * (1 - n_cand_m2 / max(1, n_cand_m1)), 1),
        "shared_hist_head": {
            str(s): hist[s] for s in sorted(hist)[:10]
        },
    }
    sh.unpersist()
    freq.unpersist()

    # -- 3. end-to-end timing m=1 vs m=2 (median of 3) ------------------
    def run(m: int) -> float:
        t0 = time.perf_counter()
        ngram_jaccard_pairs(
            docs, n=N, threshold=THRESHOLD, max_shingle_freq=MAX_DF,
            min_shared_shingles=m,
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for m in (1, 2):
        runs = [run(m) for _ in range(3)]
        out[f"sec_m{m}"] = {"runs": runs, "median": statistics.median(runs)}

    # -- 3b. rescore representation: dictionary bitmap vs string arrays -
    def run_rescore(bitmap_limit):
        t0 = time.perf_counter()
        ngram_jaccard_pairs(
            docs, n=N, threshold=THRESHOLD, max_shingle_freq=MAX_DF,
            bitmap_vocab_limit=bitmap_limit,
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for label, lim in (("bitmap", 65536), ("array", None)):
        runs = [run_rescore(lim) for _ in range(3)]
        out[f"sec_rescore_{label}"] = {
            "runs": runs, "median": statistics.median(runs)
        }

    # -- 4. output diff: pairs lost by the m=2 cut ----------------------
    p1 = ngram_jaccard_pairs(
        docs, n=N, threshold=THRESHOLD, max_shingle_freq=MAX_DF
    )
    p2 = ngram_jaccard_pairs(
        docs, n=N, threshold=THRESHOLD, max_shingle_freq=MAX_DF,
        min_shared_shingles=2,
    )
    lost = p1.select("doc_a", "doc_b").exceptAll(p2.select("doc_a", "doc_b"))
    out["pairs_m1"] = p1.count()
    out["pairs_m2"] = p2.count()
    out["pairs_lost_by_m2"] = lost.count()

    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "NGRAM_PROBE.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
