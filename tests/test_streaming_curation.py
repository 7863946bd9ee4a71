"""The curation/sampling operators on a live stream.

Every stage of the batch curation recipe that is a row-local projection
(PII redaction, quality/language scoring, hash sampling/splitting) must
run UNCHANGED on ``readStream`` — that is the point of expressing them
as pure column expressions: one code path serves backfill and the live
feed, and the hash-based sampler makes a REPLAYED micro-batch reselect
the identical rows (rand() cannot).  Pinned here with a file-source
stream, including a second batch to prove cross-batch determinism.
"""

import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_stream_flink_user_address_spark.functions.curation import pii_redact
from data_stream_flink_user_address_spark.functions.sampling import hash_split
from data_stream_flink_user_address_spark.functions.text import (
    language_id,
    quality_score,
    tokens,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write(d, fname, rows):
    with open(os.path.join(d, fname), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_curation_stages_run_on_a_stream(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    name = f"cur_{uuid.uuid4().hex[:8]}"

    stream = spark.readStream.schema(SCHEMA).json(src)
    curated = hash_split(
        pii_redact(stream)
        .withColumn("__toks", tokens("text"))
        .withColumn("lang", language_id("text"))
        .withColumn("quality", quality_score("text"))
        .drop("__toks"),
        {"train": 0.5, "test": 0.5},
        seed=7,
    )
    q = (
        curated.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        batch1 = [
            (1, "mail me at a@b.com about the big fast table scan"),
            (2, "la de la en un es el que la de en un es"),
        ]
        _write(src, "b1.json", batch1)
        q.processAllAvailable()
        batch2 = [(3, "ssn 123-45-6789 and the quick value row"), (4, "")]
        _write(src, "b2.json", batch2)
        q.processAllAvailable()
        rows = {r["doc_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()

    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["n_email"] == 1 and "[EMAIL]" in rows[1]["redacted"]
    assert rows[3]["n_ssn"] == 1 and "[SSN]" in rows[3]["redacted"]
    assert rows[1]["lang"] == "en" and rows[2]["lang"] == "es"
    assert rows[4]["quality"] == 0.25  # empty text: only the punct term
    assert all(r["split"] in ("train", "test") for r in rows.values())

    # cross-batch determinism: the stream's split assignment equals the
    # batch API's on the same keys -- replay/backfill selects the same rows
    batch_df = spark.createDataFrame(batch1 + batch2, "doc_id long, text string")
    batch_split = {
        r["doc_id"]: r["split"]
        for r in hash_split(batch_df, {"train": 0.5, "test": 0.5}, seed=7).collect()
    }
    assert {k: v["split"] for k, v in rows.items()} == batch_split


# ---------------------------------------------------------------------------
# Composed validity-then-novelty SFT admission under kill/restart
# ---------------------------------------------------------------------------


def _conv_json(words_seed: int, n: int = 6, trailing_user: bool = False,
               malformed: bool = False) -> str:
    if malformed:
        return "{truncated upload"
    content = " ".join(f"w{(words_seed * 31 + j) % 97}" for j in range(n))
    turns = [
        {"role": "system", "content": "Be concise."},
        {"role": "user", "content": content},
        {"role": "assistant", "content": content.upper()},
    ]
    if trailing_user:
        turns.append({"role": "user", "content": "hello?"})
    return json.dumps(turns)


def _write_convs(d, fname, rows):
    with open(os.path.join(d, fname), "w") as f:
        for conv_id, payload in rows:
            f.write(
                json.dumps({"conv_id": conv_id, "conversation": payload})
                + "\n"
            )


def test_sft_gate_with_dedup_store_survives_restart(spark, tmp_path):
    """The composed validity->novelty admission stream (the
    bench_stream_sft_dedup shape: parse -> structural gate -> render ->
    incremental exact dedup vs the persisted store -> survivors' turn
    rows) stopped and resumed from the SAME checkpoint, WITH a manual
    replay of an already-processed epoch in between (Spark's
    at-least-once failure mode), must converge to the sequential
    result: admitted = min-conv_id winner per distinct valid rendered
    conversation, each admitted exactly once (VERDICT r15 ask #7 --
    the epoch-replay guard existed for the gate alone; this pins the
    COMPOSITION, where a replayed epoch must also not gate against its
    own failed-run store leftovers)."""
    from data_stream_flink_user_address_spark.functions.chat import (
        _structural_flags,
        conversation_turns,
        parse_conversations,
        render_conversation,
    )
    from data_stream_flink_user_address_spark.functions.dedup import (
        incremental_exact_dedup,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def ingest(batch_df, epoch_id: int) -> None:
        parsed = parse_conversations(batch_df)
        valid = parsed.filter(_structural_flags(F.col("turns"))[-1])
        rendered = render_conversation(valid, id_col="conv_id")
        novel = incremental_exact_dedup(
            rendered, store, id_col="conv_id", batch_id=int(epoch_id)
        )
        (
            conversation_turns(valid.join(novel.select("conv_id"), "conv_id"))
            .withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .partitionBy("__epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out)
        )

    def run_stream():
        q = (
            spark.readStream.schema("conv_id long, conversation string")
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    # epoch 0: convs 0-5 valid, 6 malformed; epoch 1: 10 duplicates 0's
    # content, 11-12 new, 13 trailing-user
    batch0 = [(i, _conv_json(i)) for i in range(6)] + [
        (6, _conv_json(6, malformed=True))
    ]
    batch1 = [
        (10, _conv_json(0)),          # duplicate of conv 0 -> rejected
        (11, _conv_json(11)),
        (12, _conv_json(12)),
        (13, _conv_json(13, trailing_user=True)),  # invalid
    ]
    _write_convs(src, "a0.json", batch0)
    run_stream()
    _write_convs(src, "a1.json", batch1)
    run_stream()

    def admitted():
        return sorted(
            r.conv_id
            for r in spark.read.parquet(out)
            .select("conv_id").distinct().collect()
        )

    want_phase1 = [0, 1, 2, 3, 4, 5, 11, 12]
    assert admitted() == want_phase1
    store_before = sorted(
        r.fingerprint for r in spark.read.parquet(store).collect()
    )
    assert len(store_before) == len(set(store_before)) == 8

    # at-least-once replay: re-run the LAST epoch's batch with its own
    # epoch id -- the store anti-join must exclude __batch=1 (its own
    # leftovers) and the rewrite must change nothing
    last_epoch = max(
        int(r["__epoch"])
        for r in spark.read.parquet(out).select("__epoch").distinct().collect()
    )
    replay_df = spark.createDataFrame(
        batch1, "conv_id long, conversation string"
    )
    ingest(replay_df, last_epoch)
    assert admitted() == want_phase1
    assert sorted(
        r.fingerprint for r in spark.read.parquet(store).collect()
    ) == store_before

    # resume from the same checkpoint with new arrivals: 20 duplicates
    # conv 11, 21-22 are new
    _write_convs(src, "b2.json", [
        (20, _conv_json(11)),         # duplicate across restart -> rejected
        (21, _conv_json(21)),
        (22, _conv_json(22)),
    ])
    run_stream()
    assert admitted() == want_phase1 + [21, 22]
    # every admitted conversation lands exactly its 3 turn rows, once
    counts = {
        r.conv_id: r.n
        for r in spark.read.parquet(out)
        .groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {cid: 3 for cid in want_phase1 + [21, 22]}
