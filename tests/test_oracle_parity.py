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


PARITY_PINNED = {
    "user_address_counts", "count_by_state", "count_by_country",
    "windowed_count_by_type", "stateful_join_trace",
    "windowed_trace_inflation",
}

# r13 registry fold (VERDICT r12 ask #5) -- each retired query's
# semantics stay oracle-checked through its absorber:
#   windowed_value_sum      -> windowed_count_by_type (total_value col
#                              rides the same single hash aggregate)
#   lang_id_pred            -> doc_signals (same language_id() body)
#   quality_scores          -> doc_signals (same quality_score() body)
#   bpe_token_counts        -> doc_signals (same token-count exprs)
#   simhash_docs            -> simhash_pairs (signatures are its stage 1)
#   bpe_pair_counts         -> bpe_train (merge rounds ARE pair counting)
#                              + bigram_quality (token-bigram counts)
#   similarity_ivf_topk     -> similarity_ivf_trained (same ivf_topk()
#                              path; training starts from the stride
#                              init, untrained spelling stays unit-tested)
#   mixture_sample          -> curation_pipeline (its final stage) +
#                              token_budget_mixture (same hash decision)
#   corpus_curation         -> curation_pipeline (strict superset:
#                              same lang/quality/dedup/mixture stages
#                              plus repetition + decontamination);
#                              its below-window slot went to the new
#                              bpe_apply_docs (first driver row r14)
#   high_discount_orders    -> q6/q19 (discount-predicate semi/filter)
#   customers_without_orders-> q22 (NOT-EXISTS anti-join)
#   events_distinct_users   -> q13 (distinct-agg two-phase shape)
R13_FOLDED = {
    "windowed_value_sum", "lang_id_pred", "quality_scores",
    "bpe_token_counts", "simhash_docs", "bpe_pair_counts",
    "similarity_ivf_topk", "mixture_sample", "high_discount_orders",
    "customers_without_orders", "events_distinct_users",
    "corpus_curation",
}


def test_driver_window_covers_r13_rotation():
    """The external driver verifies only the FIRST 50 entries of
    queries() in declaration order.  r13 (VERDICT r12 asks #1 + #5):
    the registry folded 104 -> 94 queries (merge list in R13_FOLDED
    above), restoring an exact TWO-round full-coverage cycle:
    6 pinned parity + 2 x 44 rotating slots = 94 = every registered
    query, so green-within-2-rounds is the invariant again.

    r13's window = 6 parity + the 13 operators added in r12 taking
    their FIRST driver rows + doc_signals (the new fold, changed plan)
    + 30 of the 38-query relational/TPC-H set last green r11.  Below
    the window: the 8 remaining relational queries (green r11, roll to
    r14) + 35 queries green in r12's own window + the new
    bpe_apply_docs (oracle-verified by this suite now) -- together
    exactly the 44 rotating slots of r14's window, so r13 union r14
    covers all 94."""
    names = list(entrymod.queries())
    window = names[:50]
    assert len(names) == 94, len(names)
    assert not R13_FOLDED & set(names), "folded query still registered"
    first_rows = {
        "dsir_weights", "token_budget_mixture", "image_phash_pairs",
        "audio_fingerprint_pairs", "boilerplate_line_dedup",
        "bigram_quality", "overlap_chunks", "per_source_cap",
        "quality_buckets", "strip_markup", "bpe_train",
        "incremental_dedup", "bpe_encode", "doc_signals",
    }
    r11_green_in = {
        "paragraph_dedup", "curation_pipeline", "embedding_quantize",
        "q1_pricing_summary", "q2_min_cost_supplier",
        "q3_shipping_priority", "q4_order_priority",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share",
        "q9_profit_by_nation_year", "q10_returned_items",
        "q11_important_part_values", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier",
        "q16_parts_supplier_counts", "q17_small_quantity_revenue",
        "q18_large_volume_customers", "q19_discounted_revenue",
        "q20_promo_heavy_suppliers", "q21_sole_blame_supplier",
        "q22_global_sales_opportunity", "value_percentiles",
        "interval_view_purchase", "pivot_priority_status",
        "window_function_showcase", "top_parts_per_brand",
        "rollup_returns",
    }
    want = PARITY_PINNED | first_rows | r11_green_in
    missing = want - set(window)
    assert not missing, f"evicted from the driver's 50-query window: {missing}"
    assert len(window) == 50
    assert set(window) == want
    # the 44 below-window queries must all fit r14's rotating slots
    below = set(names[50:])
    assert len(below) == 44, len(below)


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
