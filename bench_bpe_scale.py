"""Measured iterative-BPE training cost at growing corpus size.

``bpe_train`` (functions/text.py) claims the classic scale trick: the
corpus is scanned ONCE into a (word, count) vocabulary and every merge
round then iterates on that compact frame, so per-round cost is bound
by VOCABULARY size, not corpus size.  This bench reuses the
English-shaped curation corpora (fixed ~2k-word vocabulary at every n
-- the realistic shape: vocabulary saturates while the corpus grows)
and records wall time for 4 merge rounds at 10^4..10^6 docs.  If the
claim holds, wall grows only through the one-time vocab scan and the
per-round increment stays flat.

Writes BPE_SCALE.json.
Run:  python bench_bpe_scale.py
      SPARK_GRAFT_BPE_SIZES=10000,100000 python bench_bpe_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_curation_scale import gen_corpus
from data_stream_flink_user_address_spark.functions.text import bpe_train
from data_stream_flink_user_address_spark.session import get_spark

N_MERGES = 4
SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_BPE_SIZES", "10000,100000,1000000"
    ).split(",")
]


def main() -> None:
    spark = get_spark("bench-bpe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in SIZES:
        path = gen_corpus(spark, n)
        docs = spark.read.parquet(path)
        t0 = time.perf_counter()
        rules = bpe_train(docs, N_MERGES).collect()
        wall = round(time.perf_counter() - t0, 2)
        rows.append(
            {
                "n_docs": n,
                "n_merges": N_MERGES,
                "wall_s": wall,
                "docs_per_sec": round(n / wall, 1),
                "first_rule": [rules[0].left, rules[0].right],
            }
        )
        print(json.dumps(rows[-1]))
    artifact = {
        "note": "bpe_train, 4 merge rounds, English-shaped corpus with a "
                "saturated ~2k-word vocabulary (bench_curation_scale corpora)."
                " Per-round work is vocabulary-bound: wall should grow only "
                "through the one-time (word,count) scan. local[*]",
        "sizes": rows,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BPE_SCALE.json"), "w") as f:
        json.dump(artifact, f, indent=1)


if __name__ == "__main__":
    main()
