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


def test_driver_window_covers_r11_rotation():
    """The external driver verifies only the FIRST 50 entries of
    queries() in declaration order.  r11 rotation (VERDICT r10 ask #1):
    the 7 parity queries stay pinned, the 38 relational/TPC-H/SQL-surface
    queries (stale since r08) rotate IN, and 5 LLM slots carry the
    queries that changed this round.  Everything rotated OUT was
    driver-green in r09/r10, so r10's window union this one covers every
    registered query."""
    window = list(entrymod.queries())[:50]
    parity = {
        "user_address_counts", "count_by_state", "count_by_country",
        "windowed_count_by_type", "windowed_value_sum",
        "stateful_join_trace", "windowed_trace_inflation",
    }
    relational = {
        "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
        "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share", "q9_profit_by_nation_year",
        "q10_returned_items", "q11_important_part_values",
        "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
        "q16_parts_supplier_counts", "q17_small_quantity_revenue",
        "q18_large_volume_customers", "q19_discounted_revenue",
        "q20_promo_heavy_suppliers", "q21_sole_blame_supplier",
        "q22_global_sales_opportunity", "value_percentiles",
        "interval_view_purchase", "pivot_priority_status",
        "window_function_showcase", "top_parts_per_brand",
        "customers_without_orders", "high_discount_orders", "rollup_returns",
        "events_json_extract", "events_distinct_users", "cube_order_stats",
        "running_customer_revenue", "set_ops_customers",
        "orders_above_customer_avg", "scalar_function_showcase",
        "grouping_sets_revenue", "scd2_customer_segments",
    }
    llm_slots = {
        "paragraph_dedup", "similarity_pq_topk", "similarity_ivfpq_topk",
        "embedding_quantize", "curation_pipeline",
    }
    missing = (parity | relational | llm_slots) - set(window)
    assert not missing, f"evicted from the driver's 50-query window: {missing}"
    assert len(window) == 50
    assert set(window) == parity | relational | llm_slots


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
