"""Scale ladder for the packed-SFT-spans deliverable
(functions/chat.py:pack_conversations_with_spans): 1e5 -> 1e6 -> 1e7
conversations rendered, SPFHP-packed byte-exactly, every loss-mask
span re-based into its bin's packed string -- plus the substring
roundtrip verification as a separate timed leg (a trainer runs it once
per corpus build as a cheap invariant sweep).

The scale claims under test: the SPFHP solve stays histogram-bound
(driver-side, corpus-size independent), packing moves each rendered
string across exactly one bin-keyed shuffle, and span re-basing ships
only slim (bin_id, id, char_base) triples -- so convs/s should be
near-flat up the ladder once fixed stage overhead amortizes.

Writes R16_OPS_SCALE.json.  Run:  python bench_sft_pack_scale.py
  SPARK_GRAFT_SFT_PACK_SIZES=100000,1000000 python bench_sft_pack_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.chat import (
    pack_conversations_with_spans,
    parse_conversations,
)
from data_stream_flink_user_address_spark.session import get_spark

SIZES = [
    int(s)
    for s in os.environ.get(
        "SPARK_GRAFT_SFT_PACK_SIZES", "100000,1000000,10000000"
    ).split(",")
]
SEQ_LEN = 192
DATA_ROOT = "/tmp/sft_pack_bench"


def gen_convs(spark, n: int) -> str:
    """Deterministic JSON chats (the bench_stream_sft shape, all valid):
    system + user(8 words) + assistant(16 words), every 3rd conv adds a
    second user/assistant pair -- word ids hashed so bins mix convs."""
    path = os.path.join(DATA_ROOT, f"n{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        def word(j):
            return F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(4096))
                .cast("string"),
            )

        def turn(role, content):
            return F.struct(
                F.lit(role).alias("role"), content.alias("content")
            )

        base = F.array(
            turn("system", F.lit("Be concise.")),
            turn("user", F.concat_ws(" ", *[word(j) for j in range(8)])),
            turn("assistant",
                 F.concat_ws(" ", *[word(j) for j in range(8, 24)])),
        )
        extra = F.array(
            turn("user", F.lit("And then?")),
            turn("assistant",
                 F.concat_ws(" ", *[word(j) for j in range(24, 28)])),
        )
        arr = F.when(F.col("id") % 3 == 0, F.concat(base, extra)).otherwise(
            base
        )
        (
            spark.range(n)
            .select(
                F.col("id").alias("conv_id"),
                F.to_json(arr).alias("conversation"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_sft_pack_scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
           "seq_len": SEQ_LEN, "sizes": []}

    # untimed warmup (bench.py convention)
    warm = parse_conversations(
        spark.read.parquet(gen_convs(spark, SIZES[0])).limit(10000)
    )
    pack_conversations_with_spans(warm, seq_len=SEQ_LEN)[1].count()

    for n in SIZES:
        convs = spark.read.parquet(gen_convs(spark, n))
        parsed = parse_conversations(convs)

        t0 = time.time()
        bins, spans, stats = pack_conversations_with_spans(
            parsed, seq_len=SEQ_LEN
        )
        # materialize BOTH deliverables (a trainer writes them out)
        bins = bins.localCheckpoint()
        spans = spans.localCheckpoint()
        n_spans = spans.count()
        dt = time.time() - t0
        row = {
            "n_convs": n,
            "n_spans": n_spans,
            "n_bins": stats["n_bins"],
            "padding_frac": round(stats["padding_frac"], 4),
            "pack_wall_s": round(dt, 2),
            "convs_per_sec": round(n / dt, 1),
        }

        # invariant sweep over the materialized outputs: every span
        # must slice its EXACT turn content back out of its bin
        from data_stream_flink_user_address_spark.functions.chat import (
            conversation_turns,
        )

        t0 = time.time()
        sliced = spans.join(
            bins.select("bin_id", "packed_text"), "bin_id"
        ).select(
            "conv_id", "turn_idx",
            F.col("packed_text")
            .substr(
                F.col("abs_start").cast("int") + 1,
                F.col("n_chars").cast("int"),
            )
            .alias("slice"),
        )
        content = conversation_turns(parsed).select(
            "conv_id", "turn_idx", "content"
        )
        n_bad = (
            sliced.join(content, ["conv_id", "turn_idx"])
            .filter(F.col("slice") != F.col("content"))
            .count()
        )
        row["verify_wall_s"] = round(time.time() - t0, 2)
        assert n_bad == 0, n_bad

        out["sizes"].append(row)
        print(json.dumps(row))

    with open(
        os.path.join(os.path.dirname(__file__), "R16_OPS_SCALE.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
