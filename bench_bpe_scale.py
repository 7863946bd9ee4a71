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
from data_stream_flink_user_address_spark.functions.text import (
    _bpe_rounds,
    bpe_apply,
    bpe_train,
    bpe_train_and_encode,
)
from data_stream_flink_user_address_spark.session import get_spark

N_MERGES = 4
DEEP_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_DEEP", "200"))
DEEP_DOCS = 100_000
CHECKPOINT_EVERY = 50
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

    # --- deep-merge run (VERDICT r12 ask #3): 200 merges at 1e5 docs
    # with the shipped localCheckpoint cadence.  Per-round walls prove
    # the trajectory is flat (lineage truncation works); without the
    # cadence each round's plan grows by one fold projection and
    # analysis cost compounds.
    docs = spark.read.parquet(gen_corpus(spark, DEEP_DOCS))
    round_walls: list[float] = []
    last = [time.perf_counter()]

    def on_round(rank: int) -> None:
        now = time.perf_counter()
        round_walls.append(round(now - last[0], 3))
        last[0] = now

    t0 = time.perf_counter()
    rules, _ = _bpe_rounds(
        docs, DEEP_MERGES, "text",
        checkpoint_every=CHECKPOINT_EVERY, on_round=on_round,
    )
    deep_wall = round(time.perf_counter() - t0, 2)
    n_done = len(rules)
    # per-50-round means: flat trajectory = later chunks ~ earlier ones
    chunk = 50
    chunk_means = [
        round(sum(round_walls[i:i + chunk]) / max(1, len(round_walls[i:i + chunk])), 3)
        for i in range(0, len(round_walls), chunk)
    ]
    deep = {
        "n_docs": DEEP_DOCS,
        "n_merges_requested": DEEP_MERGES,
        "n_merges_learned": n_done,
        "checkpoint_every": CHECKPOINT_EVERY,
        "wall_s": deep_wall,
        "sec_per_round_by_50_chunk": chunk_means,
        "max_round_s": max(round_walls) if round_walls else None,
        "last_rule": [rules[-1].__getitem__(1), rules[-1].__getitem__(2)]
        if n_done else None,
    }
    print(json.dumps(deep))

    # --- tokenizer APPLICATION throughput: merges learned once on a
    # 1e5-doc sample, applied to the full 1e6-doc corpus (broadcast
    # vocab + one doc-keyed shuffle of (pos, encoded-word) pairs).
    sample = spark.read.parquet(gen_corpus(spark, DEEP_DOCS))
    _, vocab = bpe_train_and_encode(sample, n_merges=8)
    vocab = vocab.cache(); vocab.count()
    full = spark.read.parquet(gen_corpus(spark, max(SIZES)))
    apply_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        bpe_apply(full, vocab).write.format("noop").mode("overwrite").save()
        apply_walls.append(round(time.perf_counter() - t0, 3))
    import statistics as _stats
    apply_med = _stats.median(apply_walls)
    apply = {
        "train_docs": DEEP_DOCS,
        "apply_docs": max(SIZES),
        "n_merges": 8,
        "runs": apply_walls,
        "median_s": apply_med,
        "docs_per_sec": round(max(SIZES) / apply_med, 1),
    }
    print(json.dumps(apply))

    artifact = {
        "note": "bpe_train, 4 merge rounds, English-shaped corpus with a "
                "saturated ~2k-word vocabulary (bench_curation_scale corpora)."
                " Per-round work is vocabulary-bound: wall should grow only "
                "through the one-time (word,count) scan. local[*]",
        "sizes": rows,
        "deep_merges": deep,
        "apply": apply,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BPE_SCALE.json"), "w") as f:
        json.dump(artifact, f, indent=1)


if __name__ == "__main__":
    main()
