"""Core-count scaling of shuffle-bound operators at 10^6 docs.

VERDICT r18 flagged that the sf0.1 driver bench can no longer
demonstrate parallelism (8 cores beat 32 on the whole suite: the
corpus is small enough that per-query scheduler/fixed overhead
dominates, so the `suspect_cpus_ignored` heuristic has no signal).
This rung measures the same engine operators at a size where the
shuffles carry real data -- 10^6 synthetic documents, the
bench_dedup_scale corpus (planted near-dups, pure-JVM generation) --
at two core counts, so "does the engine actually scale with cores"
has a direct on-record answer.

Operators (all shuffle-bound):
  - minhash_lsh: minhash_signatures_text (k=16) -> lsh_candidate_pairs
    (4x4 bands): per-doc signature compute, band groupBys, bucket
    self-join.
  - exact_dedup: fingerprint groupBy over the corpus.
  - token_count: explode(tokens(text)) -> groupBy(word).count() over
    ~5x10^7 tokens -- the canonical wide aggregation.

Run once per core count (the session master is fixed at JVM start):

    SPARK_GRAFT_CPUS=8  python bench_core_scaling.py
    SPARK_GRAFT_CPUS=32 python bench_core_scaling.py

Each run records medians-of-3 into CORE_SCALING.json keyed by the
core count (merging with what is already there), plus the
low/high-core speedup ratio per operator once both rungs exist.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_dedup_scale import gen_corpus
from data_stream_flink_user_address_spark.functions.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures_text,
)
from data_stream_flink_user_address_spark.functions.text import tokens
from data_stream_flink_user_address_spark.session import get_spark

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "1000000"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "CORE_SCALING.json")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_core_scaling")
    cpus = spark.sparkContext.master  # local[N]
    n_cores = int(cpus[cpus.index("[") + 1 : -1])
    docs = spark.read.parquet(gen_corpus(spark, N_DOCS))

    ops = {
        "minhash_lsh": lambda: lsh_candidate_pairs(
            minhash_signatures_text(docs, n=5, num_hashes=16),
            bands=4, rows_per_band=4,
        ),
        "exact_dedup": lambda: exact_dedup(docs),
        "token_count": lambda: (
            docs.select(F.explode(tokens("text")).alias("w"))
            .groupBy("w").count()
        ),
    }

    entry: dict = {"n_docs": N_DOCS, "ops": {}}
    for name, build in ops.items():
        build().write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        entry["ops"][name] = {
            "runs": walls, "median": statistics.median(walls)
        }
        print(f"[{n_cores} cores] {name}: {entry['ops'][name]}", flush=True)

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data.setdefault("rungs", {})[str(n_cores)] = entry
    rungs = data["rungs"]
    if len(rungs) >= 2:
        lo, hi = min(rungs, key=int), max(rungs, key=int)
        data["speedup_high_over_low"] = {
            "cores": f"{lo} -> {hi}",
            "ops": {
                name: round(
                    rungs[lo]["ops"][name]["median"]
                    / rungs[hi]["ops"][name]["median"],
                    2,
                )
                for name in rungs[hi]["ops"]
                if name in rungs[lo]["ops"]
            },
        }
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    print(json.dumps(data.get("speedup_high_over_low", {})), flush=True)


if __name__ == "__main__":
    main()
