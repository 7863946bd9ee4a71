"""Scale ladder for the r15b operators: SFT conversation prep
(functions/chat.py) and stupid-backoff LM scoring
(functions/text.py:stupid_backoff_scores), at 1e5 -> 1e7 docs.

The scale claims under test:

- every chat op is intra-row (from_json + array transform/aggregate
  expressions, zero exchanges -- plan-pinned in
  tests/test_plan_shapes.py), so throughput should be flat in corpus
  size and the only cost driver is the JSON scan itself.
  Conversations get 3/5/7 turns by conv_id % 3 (mean 5), matching the
  driver query's fixture family but one size up;
- backoff-LM scoring in the CCNet regime (reference = a fixed 5% of
  the corpus, score the rest): model cost is bounded by the
  reference, scoring is instance-multiplicity joins + one doc-keyed
  aggregate, so docs/s should rise toward the scan rate as fixed
  stage overhead amortizes.

Writes R15B_OPS_SCALE.json.  Run:  python bench_r15b_ops_scale.py
      SPARK_GRAFT_R15B_SIZES=100000,1000000 python bench_r15b_ops_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_curation_scale import gen_corpus
from data_stream_flink_user_address_spark.functions.chat import (
    conversation_turns,
    parse_conversations,
    render_conversation,
    validate_conversations,
)
from data_stream_flink_user_address_spark.session import get_spark

SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_R15B_SIZES", "100000,1000000,10000000"
    ).split(",")
]


def conv_fixture(docs):
    """documents -> one JSON conversation per row: system + user/
    assistant pair, plus 1 or 2 extra pairs for conv_id % 3 in {1, 2}
    (turn counts 3/5/7, mean 5).  Pure expressions, row-local."""
    toks = F.split(F.trim("text"), r"\s+")

    def turn(role, content):
        return F.struct(F.lit(role).alias("role"), content.alias("content"))

    def pair(u, a):
        return F.array(turn("user", u), turn("assistant", a))

    base = F.concat(
        F.array(turn("system", F.lit("Be concise."))),
        pair(F.concat_ws(" ", F.slice(toks, 1, 8)),
             F.concat_ws(" ", F.slice(toks, 9, 24))),
    )
    p2 = pair(F.lit("And then?"), F.concat_ws(" ", F.slice(toks, 33, 16)))
    p3 = pair(F.lit("Summarize."), F.concat_ws(" ", F.slice(toks, 1, 4)))
    arr = (
        F.when(F.col("doc_id") % 3 == 1, F.concat(base, p2))
        .when(F.col("doc_id") % 3 == 2, F.concat(base, p2, p3))
        .otherwise(base)
    )
    return docs.select(
        F.col("doc_id").alias("conv_id"), F.to_json(arr).alias("conversation")
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_r15b_ops_scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"), "sizes": []}
    for n in SIZES:
        docs = spark.read.parquet(gen_corpus(spark, n))
        convs = conv_fixture(docs)
        row = {"n_convs": n}

        parsed = parse_conversations(convs)

        t0 = time.time()
        agg = conversation_turns(parsed).agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("loss_mask"), F.col("n_chars"))).alias(
                "masked_chars"
            ),
            F.max("char_end").alias("max_end"),
        ).collect()[0]
        dt = time.time() - t0
        expect_turns = n // 3 * 15 + (n % 3 > 0) * 3 + (n % 3 > 1) * 5
        assert agg["n_turns"] == expect_turns, (agg["n_turns"], expect_turns)
        row["turn_flatten"] = {
            "turns": agg["n_turns"],
            "masked_chars": int(agg["masked_chars"]),
            "wall_s": round(dt, 2),
            "convs_per_sec": round(n / dt, 1),
        }

        t0 = time.time()
        v = validate_conversations(parsed).agg(
            F.sum(F.col("valid").cast("long")).alias("n_valid"),
            F.sum("n_assistant_chars").alias("asst_chars"),
        ).collect()[0]
        dt = time.time() - t0
        assert v["n_valid"] == n, v  # the fixture is structurally valid
        row["validate"] = {
            "n_valid": int(v["n_valid"]),
            "wall_s": round(dt, 2),
            "convs_per_sec": round(n / dt, 1),
        }

        t0 = time.time()
        r = render_conversation(parsed).agg(
            F.sum("n_chars").alias("chars")
        ).collect()[0]
        dt = time.time() - t0
        row["render"] = {
            "total_chars": int(r["chars"]),
            "wall_s": round(dt, 2),
            "convs_per_sec": round(n / dt, 1),
        }

        # --- backoff LM: 5% reference, score the held-out 95%
        from data_stream_flink_user_address_spark.functions.text import (
            stupid_backoff_scores,
        )

        ref = docs.filter(F.col("doc_id") % 20 == 0)
        held = docs.filter(F.col("doc_id") % 20 != 0)
        t0 = time.time()
        lm = stupid_backoff_scores(held, ref_df=ref).agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_bigram_hit").alias("hits"),
            F.sum("n_backoff").alias("backoffs"),
            F.sum("n_oov").alias("oovs"),
            F.avg("lm_logprob").alias("mean_logprob"),
        ).collect()[0]
        dt = time.time() - t0
        n_held = int(lm["docs"])
        row["backoff_lm"] = {
            "n_scored": n_held,
            "bigram_hit_frac": round(
                lm["hits"] / (lm["hits"] + lm["backoffs"]), 4
            ),
            "oov_frac_tokens": round(
                lm["oovs"] / (lm["hits"] + lm["backoffs"] + n_held), 4
            ),
            "mean_logprob": round(lm["mean_logprob"], 3),
            "wall_s": round(dt, 2),
            "docs_per_sec": round(n_held / dt, 1),
        }

        out["sizes"].append(row)
        print(json.dumps(row))

    with open(os.path.join(os.path.dirname(__file__), "R15B_OPS_SCALE.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
