"""Measured DSIR importance-weighting cost at growing corpus size.

DSIR importance weighting (functions/sampling.py:dsir_importance) is a
two-histogram + broadcast-ratio plan: the claim is that cost is one
explode+shuffle of (id, bucket) pairs over the raw corpus, with
everything downstream bounded by n_buckets.  This bench runs the
retired ``dsir_weights`` driver query's exact configuration (512
buckets, target = every 17th doc; the slot folded into
nb_quality_scores + importance_resample_docs in r15b -- see
tests/test_oracle_parity.py::R15B_FOLDED)
on the same synthetic English-shaped corpora the curation bench
uses (reused on disk when already generated) up to 10^6 documents and
records wall time + docs/sec, so the plan-shape claim has a measured
cost curve next to CURATION_SCALE.json.

Writes DSIR_SCALE.json.
Run:  python bench_dsir_scale.py
      SPARK_GRAFT_DSIR_SIZES=10000,100000 python bench_dsir_scale.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_curation_scale import DATA_ROOT, gen_corpus
from data_stream_flink_user_address_spark.session import get_spark

SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_DSIR_SIZES", "10000,100000,300000,1000000"
    ).split(",")
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_dsir_scale")
    from pyspark.sql import functions as F

    from data_stream_flink_user_address_spark.functions.sampling import (
        dsir_importance,
    )
    from data_stream_flink_user_address_spark.sources.tables import load_table

    def qfn(spark, sf_dir):
        # the retired dsir_weights driver query's exact fixture
        d = load_table(spark, sf_dir, "documents", spread=True)
        target = d.filter(F.col("doc_id") % 17 == 0)
        raw = d.filter(F.col("doc_id") % 17 != 0)
        return dsir_importance(raw, target, n_buckets=512)
    results = []
    for n in SIZES:
        corpus = gen_corpus(spark, n)
        doc_dir = os.path.join(DATA_ROOT, f"sf_n{n}")
        os.makedirs(doc_dir, exist_ok=True)
        link = os.path.join(doc_dir, "documents.parquet")
        if not os.path.exists(link):
            os.symlink(corpus, link)

        n_runs = 3 if n <= 300_000 else 1
        walls = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qfn(spark, doc_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        entry = {
            "n_docs": n,
            "runs": walls,
            "median": statistics.median(walls),
            "docs_per_sec": round(n / statistics.median(walls), 0),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)
    out = {"n_buckets": 512, "target_mod": 17, "sizes": results}
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "DSIR_SCALE.json"),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
