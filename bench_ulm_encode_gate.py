"""Measure unigram_lm_encode's size-gated word-segmentation join
(r16, VERDICT r15 "What's wrong #1"): on a corpus whose DISTINCT-WORD
set is far past any broadcast comfort zone, the gated fallback (plain
hash join on slim (word, seg) rows) must stay healthy where the old
unconditional broadcast ships the whole segmentation frame to every
executor.

Corpus: ~unique words per doc (the web-text regime: typos, URLs,
numbers), so distinct words ~ n_docs x words/doc -- the opposite of
the saturated-vocabulary ladder in bench_unigram_lm_scale.py.  The
piece table trains on a small saturated corpus (same alphabet) -- the
realistic shape: tokenizers train on a sample, encode everything.

Writes key "encode_gate" into ULM_SCALE.json.
Run:  python bench_ulm_encode_gate.py
      SPARK_GRAFT_ULM_GATE_DOCS=300000 python bench_ulm_encode_gate.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.unigram_lm import (
    unigram_lm_encode,
    unigram_lm_train,
)
from data_stream_flink_user_address_spark.session import get_spark

N_DOCS = int(os.environ.get("SPARK_GRAFT_ULM_GATE_DOCS", "1000000"))
WORDS_PER_DOC = 8
DATA_ROOT = "/tmp/ulm_gate_bench"


def gen_unique_word_corpus(spark, n: int) -> str:
    path = os.path.join(DATA_ROOT, f"n{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        words = [
            F.concat(
                F.lit("w"),
                F.xxhash64(F.col("id"), F.lit(j)).cast("string"),
            )
            for j in range(WORDS_PER_DOC)
        ]
        (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *words).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_ulm_encode_gate")
    spark.sparkContext.setLogLevel("ERROR")

    # train on a small saturated-vocabulary sample (digits + w + '-')
    train_docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(500))
                    .cast("string"),
                )
                for j in range(WORDS_PER_DOC)
            ],
        ).alias("text"),
    )
    pieces = unigram_lm_train(
        train_docs, vocab_size=256, max_piece_len=4, n_em_iters=1
    )

    docs = spark.read.parquet(gen_unique_word_corpus(spark, N_DOCS))
    n_words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .count()
    )

    def run(forced: bool, label: str) -> dict:
        t0 = time.time()
        agg = (
            unigram_lm_encode(docs, pieces, broadcast_words=forced)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_pieces").alias("pieces"),
            )
            .collect()[0]
        )
        dt = time.time() - t0
        assert agg["docs"] == N_DOCS, agg
        row = {
            "wall_s": round(dt, 2),
            "docs_per_sec": round(N_DOCS / dt, 1),
        }
        print(json.dumps({label: row}))
        return row

    # warmup (codegen + python workers) on a slice, then both paths
    unigram_lm_encode(
        docs.limit(10000), pieces, broadcast_words=False
    ).count()
    entry = {
        "n_docs": N_DOCS,
        "distinct_words": n_words,
        "broadcast_forced": run(True, "broadcast_forced"),
        "shuffle_fallback": run(False, "shuffle_fallback"),
    }

    path = os.path.join(os.path.dirname(__file__), "ULM_SCALE.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["encode_gate"] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")
    print(json.dumps({"encode_gate": entry}))
    shutil.rmtree(DATA_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
