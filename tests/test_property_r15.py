"""Property-based tests for the r15b operators: conversation span
laws (substring recovery, contiguity, render-length accounting) over
hypothesis-generated chats including unicode/empty/whitespace content,
and stupid-backoff LM laws (probability bounds, backoff monotonicity,
self-training never backs off) against an independent replica."""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_stream_flink_user_address_spark.functions.chat import (
    SEP,
    conversation_turns,
    parse_conversations,
    render_conversation,
)
from data_stream_flink_user_address_spark.functions.text import (
    stupid_backoff_scores,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# content mixes ascii words, unicode, leading/trailing/multiple spaces,
# and empties -- everything the span arithmetic must count exactly
_CONTENT = st.text(
    alphabet="ab éß ", min_size=0, max_size=12
)
_ROLE = st.sampled_from(["system", "user", "assistant", "tool"])
_TURNS = st.lists(st.tuples(_ROLE, _CONTENT), min_size=1, max_size=6)
_CONVS = st.lists(_TURNS, min_size=1, max_size=8)


@settings(**_SETTINGS)
@given(convs=_CONVS)
def test_span_laws_on_generated_conversations(spark, convs):
    rows = [
        (cid, json.dumps([{"role": r, "content": c} for r, c in turns]))
        for cid, turns in enumerate(convs)
    ]
    parsed = parse_conversations(
        spark.createDataFrame(rows, "conv_id bigint, conversation string")
    )
    turns = conversation_turns(parsed).collect()
    rendered = {
        r["conv_id"]: r for r in render_conversation(parsed).collect()
    }
    by_conv: dict[int, list] = {}
    for r in turns:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert set(by_conv) == set(range(len(convs)))
    for cid, conv_turns in by_conv.items():
        conv_turns.sort(key=lambda r: r["turn_idx"])
        text = rendered[cid]["text"]
        prev_end = 0
        for r in conv_turns:
            # law 1: the span slices the rendered string to the content
            assert text[r["char_start"]:r["char_end"]] == r["content"]
            # law 2: spans are ordered and non-overlapping, separated by
            # exactly one header (and one SEP after the first turn)
            header = "<|" + r["role"] + "|>"
            gap = len(header) + (len(SEP) if r["turn_idx"] > 0 else 0)
            assert r["char_start"] == prev_end + gap
            prev_end = r["char_end"]
        # law 3: total render length = last span end + trailing SEP
        assert rendered[cid]["n_chars"] == prev_end + len(SEP)
        assert len(text) == rendered[cid]["n_chars"]


@settings(**_SETTINGS)
@given(convs=_CONVS)
def test_pack_spans_roundtrip_on_generated_conversations(spark, convs):
    """The packed-spans laws (r16b) on arbitrary generated
    conversations -- unicode, empty and whitespace-only contents, any
    role sequence: (1) every re-based span slices its EXACT content
    back out of its bin's packed string, (2) every turn of every
    conversation appears exactly once, (3) loss_mask marks exactly the
    assistant turns."""
    from data_stream_flink_user_address_spark.functions.chat import (
        pack_conversations_with_spans,
    )

    rows = [
        (cid, json.dumps([{"role": r, "content": c} for r, c in turns]))
        for cid, turns in enumerate(convs)
    ]
    parsed = parse_conversations(
        spark.createDataFrame(rows, "conv_id bigint, conversation string")
    )
    bins, spans, stats = pack_conversations_with_spans(parsed, seq_len=256)
    assert stats["n_truncated"] == 0
    packed = {r["bin_id"]: r["packed_text"] for r in bins.collect()}
    got = spans.collect()
    assert sorted((r["conv_id"], r["turn_idx"]) for r in got) == sorted(
        (cid, i) for cid, turns in enumerate(convs)
        for i in range(len(turns))
    )
    for r in got:
        cid, i = r["conv_id"], r["turn_idx"]
        role, content = convs[cid][i]
        assert packed[r["bin_id"]][r["abs_start"]:r["abs_end"]] == content
        assert r["loss_mask"] == (role == "assistant")
        assert r["n_chars"] == len(content)


_WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "q"]), min_size=1, max_size=8
)


@settings(**_SETTINGS)
@given(
    ref=st.lists(_WORDS, min_size=1, max_size=6),
    held=st.lists(_WORDS, min_size=1, max_size=6),
)
def test_backoff_lm_laws(spark, ref, held):
    ref_rows = [(100 + i, " ".join(ws)) for i, ws in enumerate(ref)]
    held_rows = [(i, " ".join(ws)) for i, ws in enumerate(held)]
    rdf = spark.createDataFrame(ref_rows, "doc_id long, text string")
    hdf = spark.createDataFrame(held_rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in stupid_backoff_scores(hdf, ref_df=rdf).collect()
    }
    t = sum(len(ws) for ws in ref)
    # law 1: every doc scored, counts account for every token
    assert set(got) == set(range(len(held)))
    for did, ws in enumerate(held):
        r = got[did]
        assert r["n_tokens"] == len(ws)
        assert r["n_bigram_hit"] + r["n_backoff"] == len(ws) - 1
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        # law 2: score bounded by the OOV floor's cost (every token at
        # worst alpha * 0.5 / T) and below by the cheapest token (the
        # most frequent unigram / a certain bigram, never below 0)
        worst = -math.log2(0.4 * 0.5 / t)
        assert -1e-9 <= r["lm_logprob"] <= round(worst, 6) + 1e-9
    # law 3: self-scoring the reference never backs off
    self_scored = stupid_backoff_scores(rdf).collect()
    for r in self_scored:
        assert r["n_backoff"] == 0 and r["n_oov"] == 0
