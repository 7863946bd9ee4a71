"""Property-based tests (hypothesis) for the operators whose edge cases
are combinatorial rather than enumerable by hand:

- the ngram-Jaccard bitmap rescore vs its string-array twin across
  random corpora (vocab sizes crossing 64-bit word boundaries, docs
  sharing everything/nothing, duplicate docs);
- hash_split totality + hash_sample threshold nesting across random
  fraction vectors;
- pii_redact count/placeholder agreement on randomly assembled text.

Each example builds one small DataFrame with many generated rows, so a
handful of examples covers a wide input space without paying Spark job
latency per row.  max_examples stays small; determinism comes from the
operators, not from seeds.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=14,
)


@settings(**_SETTINGS)
@given(_texts)
def test_ngram_bitmap_equals_array_on_random_corpora(spark, texts):
    from data_stream_flink_user_address_spark.functions.dedup import (
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    kw = dict(n=3, threshold=0.0, max_shingle_freq=len(texts))
    bitmap = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, bitmap_vocab_limit=65536, **kw).collect()
    }
    array = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, bitmap_vocab_limit=None, **kw).collect()
    }
    assert bitmap == array


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50, unique=True),
    st.integers(min_value=0, max_value=2**31),
)
def test_hash_split_total_and_sample_nesting(spark, keys, seed):
    from data_stream_flink_user_address_spark.functions.sampling import (
        hash_sample,
        hash_split,
    )

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df, {"a": 0.3, "b": 0.3, "c": 0.4}, seed=seed
        ).collect()
    }
    assert set(got) == set(keys)  # total: every key labeled exactly once
    assert set(got.values()) <= {"a", "b", "c"}
    small = {r["doc_id"] for r in hash_sample(df, 0.2, seed=seed).collect()}
    large = {r["doc_id"] for r in hash_sample(df, 0.7, seed=seed).collect()}
    assert small <= large  # thresholds nest


_pii_bits = st.lists(
    st.sampled_from(
        [
            "x@y.io",
            "a.b@example.com",
            "10.0.0.1",
            "123-45-6789",
            "555-123-4567",
            "plain",
            "word",
            "42",
            "",
        ]
    ),
    min_size=0,
    max_size=12,
)


@settings(**_SETTINGS)
@given(st.lists(_pii_bits, min_size=1, max_size=10))
def test_pii_counts_match_placeholders(spark, rows):
    from data_stream_flink_user_address_spark.functions.curation import pii_redact

    df = spark.createDataFrame(
        [(i, " ".join(bits)) for i, bits in enumerate(rows)],
        "doc_id int, text string",
    )
    for r in pii_redact(df).collect():
        red = r["redacted"]
        assert r["n_email"] == len(re.findall(r"\[EMAIL\]", red))
        assert r["n_ssn"] == len(re.findall(r"\[SSN\]", red))
        assert r["n_phone"] == len(re.findall(r"\[PHONE\]", red))
        assert r["n_ipv4"] == len(re.findall(r"\[IP\]", red))
        # redaction is complete: no raw PII token survives
        assert "@" not in red.replace("[EMAIL]", "")


# ---------------------------------------------------------------------------
# SCD2 vs a sequential Python reference model
# ---------------------------------------------------------------------------

_scd2_cases = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),          # key
        st.sampled_from(["A", "B", "C"]),              # new segment
        st.integers(min_value=1, max_value=30),         # day offset (ts)
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[2]),                   # (key, ts) unique
)


@settings(**_SETTINGS)
@given(_scd2_cases)
def test_scd2_matches_sequential_model(spark, changes):
    from datetime import datetime, timedelta

    from data_stream_flink_user_address_spark.operators.scd2 import scd2_apply

    base = datetime(2020, 1, 1)
    cur_rows = [(k, "S", base, None, True) for k in (1, 2, 3, 4)]
    ch_rows = [(k, seg, base + timedelta(days=d)) for k, seg, d in changes]

    out = scd2_apply(
        spark.createDataFrame(
            cur_rows,
            "k long, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
        ),
        spark.createDataFrame(ch_rows, "k long, seg string, change_ts timestamp"),
        key_cols=["k"],
        tracked_cols=["seg"],
    )
    got = sorted((r.k, r.seg, r.valid_from, r.valid_to, r.is_current) for r in out.collect())

    # sequential reference: replay each key's changes in ts order,
    # skipping no-ops, closing the previous version at each survivor
    expect = []
    for k in (1, 2, 3, 4):
        versions = [("S", base)]
        for kk, seg, d in sorted(changes, key=lambda t: t[2]):
            if kk == k and seg != versions[-1][0]:
                versions.append((seg, base + timedelta(days=d)))
        for (seg, ts), nxt in zip(versions, versions[1:] + [None]):
            expect.append(
                (k, seg, ts, nxt[1] if nxt else None, nxt is None)
            )
    assert got == sorted(expect)


_pack_docs = st.lists(
    st.integers(min_value=0, max_value=40),   # token counts incl. empty docs
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(_pack_docs, st.integers(min_value=2, max_value=17))
def test_sequence_pack_matches_sequential_prefix_sum(spark, sizes, seq_len):
    from data_stream_flink_user_address_spark.functions.packing import (
        sequence_pack_offsets,
    )

    # sparse, unordered doc ids exercise the bucketing
    rows = [(i * 13 + 5, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    out = sequence_pack_offsets(
        spark.createDataFrame(rows, "doc_id long, text string"),
        seq_len=seq_len,
        sep_tokens=1,
        bucket_size=4,
    )
    got = {r.doc_id: r for r in out.collect()}

    off = 0
    for doc_id, text in sorted(rows):
        n = len(text.split()) if text else 0
        r = got[doc_id]
        assert (r.n_tokens, r.start_offset, r.end_offset) == (n, off, off + n)
        assert r.first_chunk == off // seq_len
        assert r.last_chunk == (max(off + n - 1, off)) // seq_len
        off += n + 1
