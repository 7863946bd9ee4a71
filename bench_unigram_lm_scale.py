"""Scale ladder for the unigram-LM tokenizer
(functions/unigram_lm.py): train + encode at 1e5 -> 1e7 docs.

The scale claim under test (the BPE trainer's contract, shared): the
corpus is scanned once into the (word, cnt) vocabulary and every EM /
prune round iterates on THAT frame, so training cost is
vocabulary-bound -- near-FLAT in corpus size on the synthetic corpus
(its distinct-word count saturates at ~2.6k regardless of n).  Encode
runs one Viterbi per distinct word and reassembles docs through one
doc-keyed shuffle: docs/s should track the bpe_apply numbers.

Writes ULM_SCALE.json.  Run:  python bench_unigram_lm_scale.py
      SPARK_GRAFT_ULM_SIZES=100000,1000000 python bench_unigram_lm_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_curation_scale import gen_corpus
from data_stream_flink_user_address_spark.functions.unigram_lm import (
    unigram_lm_encode,
    unigram_lm_train,
)
from data_stream_flink_user_address_spark.session import get_spark

SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_ULM_SIZES", "100000,1000000,10000000"
    ).split(",")
]
VOCAB = 512


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_unigram_lm")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"), "sizes": []}
    # untimed warmup (the bench.py convention): JVM/codegen/Python-worker
    # startup otherwise lands entirely on the first rung and bends the
    # curve (observed: 12 s at 1e5 cold vs 3.9 s at 1e6 warm)
    warm = spark.read.parquet(gen_corpus(spark, SIZES[0]))
    unigram_lm_train(warm, vocab_size=64, max_piece_len=4, n_em_iters=1)
    for n in SIZES:
        docs = spark.read.parquet(gen_corpus(spark, n))
        row = {"n_docs": n}

        t0 = time.time()
        pieces = unigram_lm_train(
            docs, vocab_size=VOCAB, max_piece_len=6, n_em_iters=2
        )
        n_pieces = pieces.count()
        dt = time.time() - t0
        row["train"] = {
            "vocab_size": VOCAB,
            "n_pieces": n_pieces,
            "wall_s": round(dt, 2),
        }

        t0 = time.time()
        agg = unigram_lm_encode(docs, pieces).agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_pieces").alias("pieces"),
            F.sum("n_words").alias("words"),
        ).collect()[0]
        dt = time.time() - t0
        assert agg["docs"] == n, agg
        row["encode"] = {
            "pieces_per_word": round(agg["pieces"] / agg["words"], 3),
            "wall_s": round(dt, 2),
            "docs_per_sec": round(n / dt, 1),
        }

        out["sizes"].append(row)
        print(json.dumps(row))

    with open(
        os.path.join(os.path.dirname(__file__), "ULM_SCALE.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
