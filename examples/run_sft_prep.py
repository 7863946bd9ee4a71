"""SFT data-prep demo: JSON chat corpus -> structural gate -> loss-mask
span manifest -> whole-conversation bin packing.

Composes the instruction-tuning surface end to end on synthetic
conversations:

1. parse_conversations: one JSON chat per row, typed turns array,
   malformed rows surfaced (not dropped) via parse_ok;
2. validate_conversations: alternation / ends-with-assistant /
   supervision-mass gate -- only structurally valid chats train;
3. conversation_turns: per-turn rows with [char_start, char_end)
   loss-mask spans into the rendered training string, computed
   intra-row (zero exchanges -- the plan the 100 TB feed wants);
4. stupid-backoff LM gate: assistant-turn text scores against a
   reference LM (here: the valid corpus's own system/user half would
   be circular, so the reference is the raw document corpus) and the
   worst per-source perplexity quartile is dropped -- the CCNet
   filter applied at the SUPERVISION-mass level;
5. pack_conversations_with_spans: whole-CONVERSATION bins (a
   bin never splits a chat, so packed-attention never crosses a
   conversation boundary mid-sample) with each conversation's mask
   spans re-based to its offset inside the packed bin.

Run: ``python examples/run_sft_prep.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.chat import (
    conversation_turns,
    pack_conversations_with_spans,
    parse_conversations,
    render_conversation,
    validate_conversations,
)
from data_stream_flink_user_address_spark.functions.sampling import (
    quality_bucket_cuts,
)
from data_stream_flink_user_address_spark.functions.text import (
    stupid_backoff_scores,
)
from data_stream_flink_user_address_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SEQ_LEN = 192  # tokens per packed bin (small: demo corpora are short)


def conv_fixture(docs):
    """documents -> JSON chats (3/5 turns; ~3% malformed rows planted
    to exercise the parse gate)."""
    toks = F.split(F.trim("text"), r"\s+")

    def turn(role, content):
        return F.struct(F.lit(role).alias("role"), content.alias("content"))

    base = F.array(
        turn("system", F.lit("Be concise.")),
        turn("user", F.concat_ws(" ", F.slice(toks, 1, 8))),
        turn("assistant", F.concat_ws(" ", F.slice(toks, 9, 24))),
    )
    extra = F.array(
        turn("user", F.lit("And then?")),
        turn("assistant", F.concat_ws(" ", F.slice(toks, 33, 12))),
    )
    arr = F.when(F.col("doc_id") % 2 == 0, F.concat(base, extra)).otherwise(base)
    payload = F.when(
        F.col("doc_id") % 31 == 7, F.lit("{truncated upload")  # planted bad rows
    ).otherwise(F.to_json(arr))
    return docs.select(
        F.col("doc_id").alias("conv_id"), payload.alias("conversation")
    )


def main() -> None:
    spark = get_spark("sft-prep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parsed = parse_conversations(conv_fixture(docs))

    # 2. structural gate: count what falls, train on what stands
    checks = validate_conversations(parsed)
    funnel = checks.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((~F.col("valid")).cast("long")).alias("rejected"),
        F.sum(F.col("valid").cast("long")).alias("kept"),
    ).collect()[0]
    print(
        f"gate: {funnel['total']} chats -> {funnel['kept']} valid "
        f"({funnel['rejected']} rejected, incl. planted malformed JSON)"
    )
    kept = parsed.join(
        checks.filter("valid").select("conv_id"), "conv_id"
    )

    # 3. per-turn loss-mask manifest
    turns = conversation_turns(kept)
    mask = turns.agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum(F.col("loss_mask").cast("long")).alias("masked_turns"),
        F.sum(F.when(F.col("loss_mask"), F.col("n_chars"))).alias("masked_chars"),
        F.sum("n_chars").alias("content_chars"),
    ).collect()[0]
    print(
        f"manifest: {mask['turns']} turns, {mask['masked_turns']} assistant "
        f"turns supervise {mask['masked_chars']}/{mask['content_chars']} "
        "content chars"
    )

    # 4. LM perplexity gate on the SUPERVISION mass: score each
    # conversation's concatenated assistant turns against a reference
    # LM (the raw document corpus) and drop the worst per-source
    # quartile -- low-quality completions cost loss budget directly
    asst_text = (
        turns.filter("loss_mask")
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "content"))
                    ),
                    lambda s: s["content"],
                ),
            ).alias("text")
        )
        .join(
            docs.select(F.col("doc_id").alias("conv_id"), "source"),
            "conv_id",
        )
    )
    scores = (
        stupid_backoff_scores(
            asst_text, ref_df=docs, id_col="conv_id", ref_id_col="doc_id"
        )
        .join(asst_text.select("conv_id", "source"), "conv_id")
    )
    binned = quality_bucket_cuts(
        scores, score_col="lm_logprob", n_buckets=4, strata_col="source"
    )
    survivors = binned.filter(F.col("quality_bucket") < 4).select("conv_id")
    n_gated = survivors.count()
    print(
        f"lm gate: {funnel['kept']} valid chats -> {n_gated} after "
        "dropping each source's worst perplexity quartile"
    )
    kept = kept.join(survivors, "conv_id")

    # 5. whole-conversation packing: the first-class deliverable
    # (functions/chat.py:pack_conversations_with_spans) -- render,
    # byte-exact SPFHP bins (pack_bins_text is NOT usable here: its
    # whitespace-normalizing token clip would destroy the rendering
    # the spans are addressed against; every rendered conversation
    # self-terminates with SEP, so conversations stay
    # newline-delimited), every loss-mask span re-based into its bin's
    # packed string
    bins, all_spans, stats = pack_conversations_with_spans(
        kept, seq_len=SEQ_LEN
    )
    print(
        f"packing: {stats['n_docs']} chats -> {stats['n_bins']} bins of "
        f"{SEQ_LEN} tokens, padding_frac={stats['padding_frac']:.3f}, "
        f"truncated={stats['n_truncated']}"
    )

    packed_spans = (
        all_spans.filter("loss_mask")
        .join(
            conversation_turns(kept).select(
                "conv_id", "turn_idx", "content"
            ),
            ["conv_id", "turn_idx"],
        )
        .select(
            "bin_id", "conv_id", "turn_idx", "content",
            F.col("abs_start").alias("bin_start"),
            F.col("abs_end").alias("bin_end"),
        )
    )
    checked = (
        packed_spans.join(bins.select("bin_id", "packed_text"), "bin_id")
        .withColumn(
            "slice",
            F.expr(
                "substring(packed_text, cast(bin_start + 1 as int), "
                "cast(bin_end - bin_start as int))"
            ),
        )
    )
    n_bad = checked.filter(F.col("slice") != F.col("content")).count()
    assert n_bad == 0, f"{n_bad} re-based spans failed to slice back"
    print(
        "span check: every bin-relative supervised span slices the "
        "assembled bin text back to its turn content"
    )
    demo_bin = packed_spans.orderBy("bin_id", "bin_start").limit(8)
    print("first packed bin's supervised spans (bin-relative):")
    for r in demo_bin.collect():
        print(
            f"  bin {r['bin_id']} conv {r['conv_id']} turn {r['turn_idx']}: "
            f"[{r['bin_start']}, {r['bin_end']})"
        )


if __name__ == "__main__":
    main()
