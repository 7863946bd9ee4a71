"""Instruction/SFT conversation prep: JSON parse round-trip, span
arithmetic against the rendered string (the substring property), the
structural validator's truth table, and a Python-replica oracle over
randomized conversations."""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_stream_flink_user_address_spark.functions.chat import (  # noqa: E402
    SEP,
    conversation_turns,
    parse_conversations,
    render_conversation,
    validate_conversations,
)


def _conv_df(spark, convs):
    """One JSON row per conversation: [(conv_id, [(role, content), ...])]."""
    rows = [
        (cid, json.dumps([{"role": r, "content": c} for r, c in turns]))
        for cid, turns in convs
    ]
    return spark.createDataFrame(rows, "conv_id bigint, conversation string")


BASIC = [
    (0, [("system", "Be concise."), ("user", "hi there"), ("assistant", "hello")]),
    (1, [("user", "2+2?"), ("assistant", "4"), ("user", "and 3?"),
         ("assistant", "5... no, 5 is wrong: 5")]),
    (2, [("user", "no reply yet")]),
]


def test_parse_roundtrip_and_malformed(spark):
    df = _conv_df(spark, BASIC)
    bad = spark.createDataFrame(
        [(99, "{not json"), (98, None)], "conv_id bigint, conversation string"
    )
    out = parse_conversations(df.unionByName(bad)).orderBy("conv_id").collect()
    by_id = {r["conv_id"]: r for r in out}
    assert by_id[0]["parse_ok"] and by_id[0]["n_turns"] == 3
    assert by_id[0]["turns"][0]["role"] == "system"
    assert by_id[0]["turns"][2]["content"] == "hello"
    assert not by_id[99]["parse_ok"] and by_id[99]["n_turns"] == -1
    assert not by_id[98]["parse_ok"]


def test_spans_substring_property(spark):
    """THE span contract: slicing the rendered string at
    [char_start, char_end) recovers each turn's content exactly."""
    parsed = parse_conversations(_conv_df(spark, BASIC))
    turns = conversation_turns(parsed)
    rendered = render_conversation(parsed)
    joined = turns.join(rendered.select("conv_id", "text"), "conv_id").withColumn(
        "slice",
        F.expr("substring(text, cast(char_start + 1 as int), cast(n_chars as int))"),
    )
    rows = joined.collect()
    assert rows
    for r in rows:
        assert r["slice"] == r["content"], (r["conv_id"], r["turn_idx"])


def test_turns_values_match_python_replica(spark):
    """Randomized conversations vs a from-scratch Python replica of the
    rendering convention (header + content + sep, spans on content)."""
    rng = random.Random(1510)
    roles = ["system", "user", "assistant"]
    convs = []
    for cid in range(40):
        n = rng.randint(1, 9)
        turns = [
            (rng.choice(roles),
             " ".join(rng.choice(["a", "bb", "ccc", "", "d e"])
                      for _ in range(rng.randint(0, 5))))
            for _ in range(n)
        ]
        convs.append((cid, turns))
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in conversation_turns(
            parse_conversations(_conv_df(spark, convs))
        ).collect()
    }
    for cid, turns in convs:
        cum = 0
        for i, (role, content) in enumerate(turns):
            start = cum + len("<|" + role + "|>")
            end = start + len(content)
            cum = end + len(SEP)
            r = got[(cid, i)]
            assert r["role"] == role and r["content"] == content
            assert (r["char_start"], r["char_end"]) == (start, end)
            assert r["n_chars"] == len(content)
            assert r["loss_mask"] == (role == "assistant")
            assert r["n_tokens"] == len(content.split())
    assert len(got) == sum(len(t) for _, t in convs)


def test_validator_truth_table(spark):
    convs = [
        # valid: system + alternating, ends assistant
        (0, [("system", "s"), ("user", "u"), ("assistant", "a")]),
        # valid: no system
        (1, [("user", "u"), ("assistant", "a")]),
        # double user turn -> alternates false
        (2, [("user", "u"), ("user", "u2"), ("assistant", "a")]),
        # trailing user turn -> ends_assistant false
        (3, [("user", "u"), ("assistant", "a"), ("user", "u2")]),
        # assistant-first -> alternates false
        (4, [("assistant", "a"), ("user", "u")]),
        # system only -> no user/assistant mass
        (5, [("system", "s")]),
        # system in the middle -> alternates false
        (6, [("user", "u"), ("system", "s"), ("assistant", "a")]),
    ]
    out = {r["conv_id"]: r
           for r in validate_conversations(
               parse_conversations(_conv_df(spark, convs))).collect()}
    assert out[0]["valid"] and out[0]["starts_system"]
    assert out[1]["valid"] and not out[1]["starts_system"]
    assert not out[2]["valid"] and not out[2]["alternates"]
    assert not out[3]["valid"] and not out[3]["ends_assistant"]
    assert not out[4]["valid"]
    assert not out[5]["valid"] and out[5]["n_assistant_turns"] == 0
    assert not out[6]["valid"] and not out[6]["alternates"]
    assert out[0]["n_assistant_chars"] == 1
    assert out[3]["n_assistant_turns"] == 1


def test_malformed_json_is_invalid_not_dropped(spark):
    df = spark.createDataFrame(
        [(7, "[{broken")], "conv_id bigint, conversation string"
    )
    parsed = parse_conversations(df)
    v = validate_conversations(parsed).collect()[0]
    assert v["valid"] is False
    # turn flattening produces no rows for the NULL array (explode drops)
    assert conversation_turns(parsed).count() == 0


def test_empty_content_and_unicode_lengths(spark):
    convs = [(0, [("user", ""), ("assistant", "café über")])]
    parsed = parse_conversations(_conv_df(spark, convs))
    rows = {r["turn_idx"]: r for r in conversation_turns(parsed).collect()}
    assert rows[0]["n_chars"] == 0 and rows[0]["char_start"] == rows[0]["char_end"]
    # length() counts CHARACTERS, not bytes -- spans stay character-addressed
    assert rows[1]["n_chars"] == len("café über")
    rendered = render_conversation(parsed).collect()[0]
    assert rendered["n_chars"] == len(
        "<|user|>" + SEP + "<|assistant|>" + "café über" + SEP
    )


def test_chat_ops_run_on_a_stream(spark, tmp_path):
    """The SFT prep ops on a live stream: parse -> validate -> flatten
    are all row-local expressions, so one code path serves backfill and
    a live conversation feed UNCHANGED (the streaming-curation
    convention), with spans identical to the batch API's on replay."""
    import uuid

    from pyspark.sql import types as T

    src = str(tmp_path / "in")
    os.makedirs(src)
    name = f"sft_{uuid.uuid4().hex[:8]}"
    schema = T.StructType(
        [
            T.StructField("conv_id", T.LongType()),
            T.StructField("conversation", T.StringType()),
        ]
    )

    def write_batch(fname, convs):
        with open(os.path.join(src, fname), "w") as f:
            for cid, turns in convs:
                conv = json.dumps(
                    [{"role": r, "content": c} for r, c in turns]
                )
                f.write(json.dumps({"conv_id": cid, "conversation": conv}) + "\n")

    stream = spark.readStream.schema(schema).json(src)
    parsed = parse_conversations(stream)
    q = (
        conversation_turns(parsed)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        write_batch("b1.json", BASIC[:2])
        q.processAllAvailable()
        write_batch("b2.json", BASIC[2:])
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()

    batch = conversation_turns(parse_conversations(_conv_df(spark, BASIC)))
    want = {
        (r["conv_id"], r["turn_idx"]): (r["char_start"], r["char_end"], r["loss_mask"])
        for r in batch.collect()
    }
    assert {
        (r["conv_id"], r["turn_idx"]): (r["char_start"], r["char_end"], r["loss_mask"])
        for r in got
    } == want


def test_null_turn_fields_stay_null_honest(spark):
    """A turn with a JSON null role or content is malformed data: its
    own span/mask columns come out NULL (never fabricated), and the
    validator rejects the conversation -- nothing is silently dropped
    or defaulted."""
    df = spark.createDataFrame(
        [
            (1, '[{"role": "user", "content": null}, '
                '{"role": "assistant", "content": "ok"}]'),
            (2, '[{"role": null, "content": "x"}, '
                '{"role": "assistant", "content": "y"}]'),
        ],
        "conv_id bigint, conversation string",
    )
    parsed = parse_conversations(df)
    rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in conversation_turns(parsed).collect()
    }
    # conv 1: NULL content -> the turn's start is still derivable
    # (header lengths are known) but its end and every LATER turn's
    # offsets poison to NULL rather than guessing
    assert rows[(1, 0)]["n_chars"] is None
    assert rows[(1, 0)]["char_start"] == len("<|user|>")
    assert rows[(1, 0)]["char_end"] is None
    assert rows[(1, 1)]["char_start"] is None
    # conv 2: NULL role -> NULL header length and NULL loss_mask
    assert rows[(2, 0)]["loss_mask"] is None
    assert rows[(2, 0)]["char_start"] is None
    v = {r["conv_id"]: r for r in validate_conversations(parsed).collect()}
    assert not v[1]["valid"] and not v[2]["valid"]


def test_streaming_sft_gate_epochs_and_replay(spark, tmp_path):
    """streaming_sft_gate end to end: two file-source micro-batches
    land as __epoch=N partitions of turn rows for VALID conversations
    only, and a manually replayed epoch rewrites exactly its own
    partition (the admission-gate idempotency contract)."""
    from data_stream_flink_user_address_spark.functions.chat import (
        streaming_sft_gate,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    out = str(tmp_path / "out")

    def jline(cid, turns):
        return json.dumps(
            {
                "conv_id": cid,
                "conversation": json.dumps(
                    [{"role": r, "content": c} for r, c in turns]
                ),
            }
        )

    with open(os.path.join(src, "b1.json"), "w") as f:
        f.write(jline(1, [("user", "hi"), ("assistant", "hello")]) + "\n")
        f.write(jline(2, [("user", "no reply")]) + "\n")  # invalid
    stream = (
        spark.readStream.schema("conv_id long, conversation string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = streaming_sft_gate(stream, out, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        with open(os.path.join(src, "b2.json"), "w") as f:
            f.write(
                jline(3, [("system", "s"), ("user", "a b"), ("assistant", "c")])
                + "\n"
            )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    got = sorted({(r["conv_id"], r["__epoch"]) for r in rows})
    assert got == [(1, 0), (3, 1)]  # conv 2 gated out
    spans = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    assert spans[(1, 1)]["loss_mask"] and spans[(1, 1)]["char_start"] == len(
        "<|user|>hi" + SEP + "<|assistant|>"
    )

    # replay epoch 1 with different survivors: ONLY __epoch=1 rewrites
    replay = spark.createDataFrame(
        [(4, json.dumps([{"role": "user", "content": "x"},
                         {"role": "assistant", "content": "y"}]))],
        "conv_id long, conversation string",
    )
    from data_stream_flink_user_address_spark.functions.chat import (
        conversation_turns,
        parse_conversations,
        validate_conversations,
    )
    parsed = parse_conversations(replay)
    kept = parsed.join(
        validate_conversations(parsed).filter("valid").select("conv_id"),
        "conv_id",
    )
    (
        conversation_turns(kept)
        .withColumn("__epoch", F.lit(1))
        .write.mode("overwrite")
        .partitionBy("__epoch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out)
    )
    after = sorted(
        {(r["conv_id"], r["__epoch"])
         for r in spark.read.parquet(out).collect()}
    )
    assert after == [(1, 0), (4, 1)]


def test_streaming_sft_gate_rejects_flat_layout(spark, tmp_path):
    import pytest

    from data_stream_flink_user_address_spark.functions.chat import (
        streaming_sft_gate,
    )

    out = str(tmp_path / "flat")
    spark.createDataFrame([(1, "x")], ["conv_id", "conversation"]).write.parquet(out)
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="flat-append"):
        streaming_sft_gate(stream, out, str(tmp_path / "ck"))


def test_pack_conversations_with_spans_roundtrip(spark):
    """The trainer deliverable (r16b): every turn's re-based span must
    slice its EXACT content back out of the bin's packed string --
    including multi-conversation bins, unicode content, and the
    two-pair conversation shape."""
    from data_stream_flink_user_address_spark.functions.chat import (
        pack_conversations_with_spans,
        parse_conversations,
    )

    convs = [
        (1, json.dumps([
            {"role": "system", "content": "Be concise."},
            {"role": "user", "content": "héllo  there"},
            {"role": "assistant", "content": "hi\nback"},
        ])),
        (2, json.dumps([
            {"role": "user", "content": "a b c"},
            {"role": "assistant", "content": "d"},
            {"role": "user", "content": "e?"},
            {"role": "assistant", "content": "f g"},
        ])),
        (3, json.dumps([
            {"role": "user", "content": "x"},
            {"role": "assistant", "content": "y"},
        ])),
    ]
    df = spark.createDataFrame(convs, "conv_id long, conversation string")
    parsed = parse_conversations(df)
    bins, spans, stats = pack_conversations_with_spans(parsed, seq_len=64)
    assert stats["n_truncated"] == 0 and stats["n_docs"] == 3
    packed = {r.bin_id: r.packed_text for r in bins.collect()}
    got = spans.collect()
    # every turn of every conversation appears exactly once
    assert sorted((r.conv_id, r.turn_idx) for r in got) == [
        (1, 0), (1, 1), (1, 2),
        (2, 0), (2, 1), (2, 2), (2, 3),
        (3, 0), (3, 1),
    ]
    turns = {
        (cid, i): t["content"]
        for cid, payload in convs
        for i, t in enumerate(json.loads(payload))
    }
    for r in got:
        assert packed[r.bin_id][r.abs_start:r.abs_end] == turns[
            (r.conv_id, r.turn_idx)
        ]
        assert r.loss_mask == (r.role == "assistant")


def test_pack_conversations_with_spans_rejects_oversize(spark):
    """Byte-exact packing cannot clip: a conversation rendering past
    seq_len tokens must raise (pack_bins_exact's truncation guard),
    not silently corrupt spans."""
    import pytest
    from data_stream_flink_user_address_spark.functions.chat import (
        pack_conversations_with_spans,
        parse_conversations,
    )

    big = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, json.dumps([
            {"role": "user", "content": big},
            {"role": "assistant", "content": big},
        ]))],
        "conv_id long, conversation string",
    )
    with pytest.raises(ValueError, match="truncated"):
        pack_conversations_with_spans(parse_conversations(df), seq_len=16)


def test_pack_conversations_with_spans_rejects_null_turns(spark):
    """A parse-failed conversation (NULL turns) renders NULL and would
    be silently EXCLUDED by the packer's histogram -- vanished from
    bins and spans with no error (code-review r16).  The validation
    action must fail loudly and point at the parse_ok gate."""
    import pytest
    from data_stream_flink_user_address_spark.functions.chat import (
        pack_conversations_with_spans,
        parse_conversations,
    )

    df = spark.createDataFrame(
        [
            (1, json.dumps([
                {"role": "user", "content": "a"},
                {"role": "assistant", "content": "b"},
            ])),
            (2, "{truncated upload"),
        ],
        "conv_id long, conversation string",
    )
    with pytest.raises(ValueError, match="parse_ok"):
        pack_conversations_with_spans(parse_conversations(df), seq_len=16)


def test_pack_conversations_guard_survives_filter_pushdown(spark):
    """The NULL-turns guard must NOT fire when invalid conversations
    were already removed by an upstream JOIN (the run_sft_prep shape):
    Catalyst pushes the packer's length filter below such joins, so an
    expression-embedded raise would evaluate on the pre-join rows --
    the regression that forced the guard to be a validation action."""
    from data_stream_flink_user_address_spark.functions.chat import (
        pack_conversations_with_spans,
        parse_conversations,
        validate_conversations,
    )

    df = spark.createDataFrame(
        [
            (1, json.dumps([
                {"role": "user", "content": "a b"},
                {"role": "assistant", "content": "c d"},
            ])),
            (2, "{truncated"),
        ],
        "conv_id long, conversation string",
    )
    parsed = parse_conversations(df)
    kept = parsed.join(
        validate_conversations(parsed).filter("valid").select("conv_id"),
        "conv_id",
    )
    bins, spans, stats = pack_conversations_with_spans(kept, seq_len=16)
    assert stats["n_docs"] == 1
    assert [r.conv_id for r in spans.select("conv_id").distinct().collect()] == [1]


def test_streaming_sft_pack_epochs_replay_and_span_integrity(spark, tmp_path):
    """The full SFT build as one stream (r16b): per-epoch byte-exact
    packing with both deliverables under __epoch partitions.  Pins (a)
    bins are addressed (__epoch, bin_id) and every admitted
    conversation lands exactly once, (b) every re-based span slices its
    content back out of its epoch's bin, (c) a manually replayed epoch
    (at-least-once delivery) rewrites exactly its own partitions in
    BOTH directories."""
    from data_stream_flink_user_address_spark.functions.chat import (
        _sft_pack_epoch,
        streaming_sft_pack,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    bins_path = str(tmp_path / "bins")
    spans_path = str(tmp_path / "spans")

    def _write_convs(d, fname, rows):
        with open(os.path.join(d, fname), "w") as f:
            for conv_id, payload in rows:
                f.write(
                    json.dumps(
                        {"conv_id": conv_id, "conversation": payload}
                    ) + "\n"
                )

    def conv(seed, malformed=False):
        if malformed:
            return "{nope"
        c = " ".join(f"w{(seed * 7 + j) % 50}" for j in range(5))
        return json.dumps([
            {"role": "user", "content": c},
            {"role": "assistant", "content": c.upper()},
        ])

    batch0 = [(i, conv(i)) for i in range(6)] + [(6, conv(6, True))]
    batch1 = [(10 + i, conv(100 + i)) for i in range(4)]
    _write_convs(src, "e0.json", batch0)
    _write_convs(src, "e1.json", batch1)

    q = streaming_sft_pack(
        spark.readStream.schema("conv_id long, conversation string")
        .option("maxFilesPerTrigger", "1")
        .json(src),
        bins_path, spans_path, str(tmp_path / "ck"), seq_len=32,
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    bins = spark.read.parquet(bins_path)
    spans = spark.read.parquet(spans_path)
    # (a) the malformed conversation is gated out; the rest land once
    assert sorted(
        r.conv_id for r in spans.select("conv_id").distinct().collect()
    ) == [0, 1, 2, 3, 4, 5, 10, 11, 12, 13]
    assert spans.count() == 10 * 2  # two turns each
    # epochs partition both deliverables
    assert (
        bins.select("__epoch").distinct().count()
        == spans.select("__epoch").distinct().count()
        == 2
    )
    # (b) span integrity within each epoch's bins
    packed = {
        (r["__epoch"], r.bin_id): r.packed_text for r in bins.collect()
    }
    contents = {}
    for cid, payload in batch0 + batch1:
        try:
            for i, t in enumerate(json.loads(payload)):
                contents[(cid, i)] = t["content"]
        except ValueError:
            pass
    for r in spans.collect():
        text = packed[(r["__epoch"], r.bin_id)]
        assert text[r.abs_start:r.abs_end] == contents[(r.conv_id, r.turn_idx)]

    # (c) manual at-least-once replay of epoch 1 changes nothing
    before_bins = sorted(
        (r["__epoch"], r.bin_id, r.packed_text) for r in bins.collect()
    )
    before_spans = sorted(
        (r["__epoch"], r.conv_id, r.turn_idx, r.abs_start)
        for r in spans.collect()
    )
    # file -> epoch order is not guaranteed: replay whichever batch
    # actually landed in the last epoch
    last_epoch = max(int(r["__epoch"])
                     for r in bins.select("__epoch").distinct().collect())
    epoch_convs = {
        r.conv_id
        for r in spans.filter(F.col("__epoch") == last_epoch)
        .select("conv_id").distinct().collect()
    }
    all_rows = {cid: payload for cid, payload in batch0 + batch1}
    replay_rows = [
        (cid, all_rows[cid]) for cid in sorted(epoch_convs)
    ]
    # the gated malformed conversation belongs to batch0's epoch
    if 6 in all_rows and 0 in epoch_convs:
        replay_rows.append((6, all_rows[6]))
    replay = spark.createDataFrame(
        replay_rows, "conv_id long, conversation string"
    )
    _sft_pack_epoch(
        replay, last_epoch, bins_path, spans_path, 32,
        "conversation", "conv_id", 100_000,
    )
    assert sorted(
        (r["__epoch"], r.bin_id, r.packed_text)
        for r in spark.read.parquet(bins_path).collect()
    ) == before_bins
    assert sorted(
        (r["__epoch"], r.conv_id, r.turn_idx, r.abs_start)
        for r in spark.read.parquet(spans_path).collect()
    ) == before_spans
