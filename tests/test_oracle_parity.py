"""Every queries() entry must match its oracle_sql() on DuckDB at sf0.01.

This mirrors the driver's t2 correctness gate locally so regressions are
caught before a round ends.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle_or_is_flagged():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_dtype_gate_catches_uncast_hugeint(spark, con):
    """The r08 q12 red row: identical values, DuckDB HUGEINT vs Spark
    bigint.  The dtype gate must flag exactly this class of drift."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.sum(F.when(F.col("id") > 0, 1).otherwise(0)).alias("cnt")
    )
    bad = "SELECT sum(CASE WHEN range > 0 THEN 1 ELSE 0 END) AS cnt FROM range(3)"
    good = bad.replace("END)", "END)::BIGINT")
    problems = compare(df, con, bad, "uncast")
    assert any("dtype" in p and "i128" in p for p in problems), problems
    assert not compare(df, con, good, "cast")


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_parity(spark, con, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, SF_DIR)
    if name not in oracles:
        # rows-only check (matches the driver's weaker gate)
        assert df.count() >= 0
        return
    problems = compare(df, con, oracles[name], name)
    assert not problems, "\n".join(problems)


def test_driver_window_covers_r12_rotation():
    """The external driver verifies only the FIRST 50 entries of
    queries() in declaration order.  r12 rotation (VERDICT r11 ask #4):
    the 7 parity queries stay pinned, the 36 LLM queries last green in
    r10 rotate back IN, the two PQ queries whose config changed this
    round (persisted trained codebooks; order-independent capped seeds)
    plus the two NEW codec round-trip queries hold the changed slots,
    and q12/session/asof cover the 3 relational queries r11's window
    did not carry.  Everything rotated OUT (38 relational +
    embedding_quantize + paragraph_dedup + curation_pipeline) was
    driver-green in r11, so r11's window union this one covers every
    query registered BEFORE r12.  The 13 operators ADDED in r12
    (dsir_weights .. bpe_encode, kept below the window) are
    oracle-verified by this suite and the drive_contract script and
    take their first driver rows in r13.  Rotation arithmetic: with
    104 registered queries, 7 pinned parity + 43 rotating slots cover
    at most 93 distinct queries per two rounds, so full driver
    coverage is a THREE-round cycle from r12 on (green-within-3 is the
    invariant; r13 takes the 13 new + 30 of the r11-green set, r14
    takes the remainder)."""
    window = list(entrymod.queries())[:50]
    parity = {
        "user_address_counts", "count_by_state", "count_by_country",
        "windowed_count_by_type", "windowed_value_sum",
        "stateful_join_trace", "windowed_trace_inflation",
    }
    llm_slots = {
        "similarity_pq_topk", "similarity_ivfpq_topk",
        "multimodal_pixel_roundtrip", "audio_features_real",
    }
    llm_set = {
        "gopher_quality", "sequence_pack", "chunk_manifest",
        "cluster_balanced_sample", "substring_dup_spans",
        "similarity_ivf_trained", "semantic_dedup",
        "similarity_quantized_topk", "bm25_search", "dataset_split",
        "text_stats", "corpus_report", "bpe_pair_counts", "lang_id_pred",
        "quality_scores", "bpe_token_counts", "winnow_fingerprints",
        "corpus_curation", "dedup_exact", "minhash_lsh_pairs",
        "dedup_clusters", "fuzzy_dedup_keep", "ngram_jaccard_pairs",
        "simhash_docs", "simhash_pairs", "embedding_near_dup",
        "embedding_near_dup_lsh", "similarity_topk", "similarity_lsh_topk",
        "similarity_ivf_topk", "multimodal_meta", "pii_redact",
        "repetition_stats", "contamination_check", "mixture_sample",
        "unigram_quality",
    }
    relational_gap = {
        "q12_late_shipments", "session_window_stats", "asof_purchase_view",
    }
    missing = (parity | llm_slots | llm_set | relational_gap) - set(window)
    assert not missing, f"evicted from the driver's 50-query window: {missing}"
    assert len(window) == 50
    assert set(window) == parity | llm_slots | llm_set | relational_gap


def test_round_half_away_matches_oracle_round():
    """round_half_away must agree with DuckDB round() (half away from
    zero) on exact half-boundaries where np.round (half-to-even) does
    not -- the ADVICE r8 cosine-rounding contract."""
    import numpy as np

    from data_stream_flink_user_address_spark.functions.similarity import (
        round_half_away,
    )

    vals = [0.1234565, -0.1234565, 0.1234575, -0.1234575, 0.5e-6, -0.5e-6, 0.0]
    got = round_half_away(np.array(vals, dtype=np.float64), 6)
    con = duckdb.connect()
    for v, g in zip(vals, got):
        (want,) = con.execute(f"SELECT round({v!r}::DOUBLE, 6)").fetchone()
        assert g == want, (v, g, want)
    # and it diverges from np.round where the tie-break differs,
    # proving the test would catch a regression to half-to-even
    assert round_half_away(np.array([0.1234565]), 6)[0] != np.round(
        np.array([0.1234565]), 6
    )[0]


def test_round_half_away_property_fuzz():
    """round_half_away == decimal ROUND_HALF_UP on arbitrary doubles
    (the DuckDB/Spark round() contract), fuzzed."""
    import decimal

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_stream_flink_user_address_spark.functions.similarity import (
        round_half_away,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(
            min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False
        )
    )
    def check(x):
        got = float(round_half_away(np.array([x], dtype=np.float64), 6)[0])
        # the helper operates on scaled doubles, so the reference must
        # round the same scaled double (not the shortest-repr decimal):
        # floor(|x|*1e6 + 0.5) with the sign restored
        scaled = abs(x) * 1e6
        want = float(
            decimal.Decimal(scaled).quantize(0, rounding=decimal.ROUND_HALF_UP)
        ) / 1e6
        want = -want if x < 0 else want
        assert got == want, (x, got, want)

    check()
