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


# r14 registry fold (VERDICT r13 ask #1's budget) -- nine retired slots
# pay for the nine r13b-family registrations; each retired query's
# semantics stay checked through its absorber:
#   dataset_split             -> leakage_split (STRICT superset: stage 1
#                                is the identical hash_split ranges)
#   contamination_check       -> curation_pipeline (same %25-eval
#                                broadcast gram anti-join is its
#                                decontamination stage) + the new
#                                doc-level decontaminate_pairs
#   minhash_lsh_pairs         -> fuzzy_dedup_keep (its stage 1) +
#                                incremental_minhash_gate (same banding)
#   dedup_clusters            -> fuzzy_dedup_keep (its stage 2) +
#                                incremental_minhash_gate (same min-id
#                                keep rule, SQL recursive-CTE checked)
#   sequence_pack             -> chunk_manifest (the offsets ARE its
#                                first stage; manifest explodes them)
#   embedding_near_dup        -> embedding_near_dup_lsh (same exact-
#                                cosine pair predicate as its verify
#                                stage; the exhaustive variant stays
#                                unit-tested with ANN_SCALE crossover)
#   similarity_pq_topk        -> similarity_ivfpq_topk (the ADC scan is
#                                its stage 2; plain-PQ plan contract
#                                stays pinned in tests/test_pq.py)
#   similarity_quantized_topk -> embedding_quantize (SQ8 encode/decode)
#                                + similarity_topk (exact ranking);
#                                plan contract stays in test_plan_shapes
#   similarity_lsh_topk       -> embedding_near_dup_lsh (hyperplane
#                                bucketing) + similarity_topk (ranking);
#                                recall stays pinned in TOPK_RECALL.json
R14_FOLDED = {
    "dataset_split", "contamination_check", "minhash_lsh_pairs",
    "dedup_clusters", "sequence_pack", "embedding_near_dup",
    "similarity_pq_topk", "similarity_quantized_topk",
    "similarity_lsh_topk",
}


# r15 registry fold (VERDICT r14 ask #2's budget) -- six retired slots
# pay for the six crawl-graph composite registrations; each retired
# query's semantics stay checked through its absorber:
#   value_percentiles    -> curriculum_assignment (the stage cuts ARE a
#                           percentile aggregate, oracle-replicated) +
#                           quality_buckets (quality_bucket_cuts runs
#                           the same percentile_approx idiom; that slot
#                           itself folded into lm_ppl_buckets in r15b,
#                           which reruns the identical cut machinery)
#   top_parts_per_brand  -> window_function_showcase (per-group rank
#                           analytics over the same deterministic
#                           frame) + top_terms_rrf / bm25_search (the
#                           per-group top-k TakeOrdered shape)
#   rollup_returns       -> cube_order_stats (CUBE is a strict superset
#                           of ROLLUP on the same grouping-set
#                           machinery) + grouping_sets_revenue
#   bigram_quality       -> nb_quality_scores (hashed unigram+bigram
#                           counts and smoothed log-arithmetic are its
#                           features, fully oracle-replicated) +
#                           unigram_quality (the order-1 LM score)
#   strip_markup         -> main_content_extract (its strip stage runs
#                           the identical tag/entity/whitespace chain
#                           on every row, entity outcomes hash-pinned)
#   overlap_chunks       -> chunk_manifest (same token-offset chunk
#                           explosion arithmetic; the sliding-window
#                           variant stays unit+property tested)
R15_FOLDED = {
    "value_percentiles", "top_parts_per_brand", "rollup_returns",
    "bigram_quality", "strip_markup", "overlap_chunks",
}


# r15b registry fold -- three more retired slots pay for the three
# r15b registrations (sft_turn_spans, embedding_moments,
# lm_ppl_buckets); each retired query's semantics stay checked through
# its absorber:
#   bpe_encode      -> bpe_apply_docs (the vocabulary-encoding frame
#                      IS its broadcast stage, and the oracle replays
#                      the identical 8-merge encode CTE chain per
#                      document) + bpe_train (same merge loop and
#                      persisted artifact)
#   dsir_weights    -> nb_quality_scores (identical hashed
#                      unigram+bigram featurization and smoothed
#                      log-ratio arithmetic over a two-way corpus
#                      split, fully SQL-replicated) +
#                      importance_resample_docs (the downstream
#                      weight-driven selection); dsir_importance
#                      itself stays unit-tested (tests/test_functions)
#                      with its scale ladder in DSIR_SCALE.json
#   quality_buckets -> lm_ppl_buckets (STRICT superset of the binning
#                      machinery: the identical
#                      quality_stratified_buckets exact ntile AND
#                      quality_bucket_cuts broadcast approx cuts rerun
#                      and re-oracle-check over the backoff-LM score
#                      instead of doc length); the slim-window and
#                      broadcast-no-window plan contracts target the
#                      functions directly in test_plan_shapes, and the
#                      skewed 1e6-doc shape comparison stays in
#                      R13_OPS_SCALE.json
R15B_FOLDED = {
    "bpe_encode", "dsir_weights", "quality_buckets",
}


# r16 registry fold (VERDICT r15 asks #2 + #4 + #6's budget) -- three
# retired slots pay for the three r16 registrations; each retired
# query's semantics stay checked through its absorber:
#   corpus_report   -> profile_funnel (the per-stage corpus_profile
#                      re-derives the report's volume arithmetic and
#                      its EXACT countDistinct-fingerprint dup rate,
#                      exact_distinct=True, over funnel stages instead
#                      of sources) + doc_signals (identical
#                      language_id()/quality_score() bodies, value-
#                      checked per doc -- the R13 lang_id_pred/
#                      quality_scores precedent) + corpus_diff_status
#                      (the same md5 whitespace-normalized content
#                      fingerprint, emitted raw and hash-pinned)
#   unigram_quality -> lm_ppl_buckets (the stupid-backoff model's
#                      unigram tier IS the same corpus-unigram
#                      log2-arithmetic with the same 0.5/T OOV floor,
#                      fully SQL-replicated per token; at any vocab
#                      within the top-V cut the two scores share every
#                      term) + nb_quality_scores (smoothed hashed
#                      unigram-count features); bigram_quality's r15
#                      absorption chain re-homes onto those same two
#                      absorbers; the top-V/broadcast plan contract
#                      targets unigram_logprob_scores directly in
#                      test_plan_shapes
#   text_stats      -> doc_signals (token_count IS its n_ws_tokens
#                      column, identical body; punct_count's body rides
#                      inside the oracle-checked quality punct term) +
#                      corpus_diff_status (the same md5
#                      whitespace-normalized content fingerprint,
#                      emitted raw as old_fp/new_fp and hash-pinned)
#   bpe_train       -> bpe_apply_docs (STRICT superset oracle: its CTE
#                      chain replays ALL 8 merge rounds -- the entire
#                      training -- before encoding every document under
#                      the learned vocabulary, and the engine query
#                      reads the same persisted _bpe_artifacts table
#                      the trainer writes; the train loop stays unit-,
#                      property- (tests/test_functions) and ladder-
#                      tested, BPE_SCALE.json); this below-window
#                      retirement restores the exact 2 x 44 two-round
#                      cycle after sft_pack_spans' r16b growth, so no
#                      rotating query waits an extra round.
#                      r15b's bpe_encode chain re-homes onto
#                      bpe_apply_docs alone.
R16_FOLDED = {
    "corpus_report", "unigram_quality", "text_stats", "bpe_train",
}


# r17 fold (pays for the substring_dedup_cut registration):
#   sft_turn_spans -> sft_pack_spans (STRICT absorption: the packed-
#                      spans deliverable derives the SAME deterministic
#                      wire-round-tripped conversations, replays the
#                      identical per-turn offset arithmetic -- abs_start
#                      = char_base + char_start -- and hash-checks every
#                      span via the in-row span_ok substring test
#                      against the packed string, so the retired
#                      query's turn_idx/role/loss_mask/n_chars/offset
#                      contract survives in a stronger composite; the
#                      flatten's zero-exchange plan stays pinned in
#                      tests/test_plan_shapes.py over the engine
#                      functions directly).
R17_FOLDED = {
    "sft_turn_spans",
}


def test_driver_window_covers_r19_rotation():
    """The external driver verifies only the FIRST 50 entries of
    queries() in declaration order.  r19 (VERDICT r18 ask #3, executed
    untouched): the other half of the exact TWO-round cycle -- 6
    pinned parity + 2 x 44 rotating slots -- swings the 44 queries
    green in r17's own window back in-window with ZERO slack, so r18
    union r19 = 94/94, and the driver's correctness row lands on the
    15 paths whose plans changed in r18 without a post-change driver
    check (pagerank/crawl-gate/lm_ppl first -- all 15 sit in this
    half).  No r19 registration and no fold.

    Below the window: exactly the 44 queries green in r18's own window
    (CORRECTNESS_r18.json minus the 6 pinned) -- r20's rotating
    slots."""
    names = list(entrymod.queries())
    window = names[:50]
    assert len(names) == 94, len(names)
    assert not (
        R13_FOLDED | R14_FOLDED | R15_FOLDED | R15B_FOLDED | R16_FOLDED
        | R17_FOLDED
    ) & set(names), "folded query still registered"
    r15_green_rotating = {
        "token_budget_mixture", "image_phash_pairs",
        "audio_fingerprint_pairs", "boilerplate_line_dedup",
        "per_source_cap",
        "incremental_dedup", "doc_signals",
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
        "q22_global_sales_opportunity", "interval_view_purchase",
        "pivot_priority_status", "window_function_showcase",
        "crawl_frontier_gate", "main_content_extract",
        "domain_pagerank_ranks", "connected_components_labels",
        "corpus_diff_status", "curriculum_assignment",
        "sft_turn_spans", "embedding_moments", "lm_ppl_buckets",
    }
    # in-window: exactly the 44 queries green in r16's own window (the
    # r14-green rotating slots minus R16_FOLDED, plus the three r16
    # registrations)
    r16_green_rotating = {
        "events_json_extract", "cube_order_stats",
        "running_customer_revenue", "set_ops_customers",
        "orders_above_customer_avg", "scalar_function_showcase",
        "grouping_sets_revenue", "scd2_customer_segments",
        "similarity_ivfpq_topk", "multimodal_pixel_roundtrip",
        "audio_features_real", "gopher_quality", "chunk_manifest",
        "cluster_balanced_sample", "substring_dup_spans",
        "similarity_ivf_trained", "semantic_dedup", "bm25_search",
        "winnow_fingerprints",
        "bpe_apply_docs", "dedup_exact", "fuzzy_dedup_keep",
        "ngram_jaccard_pairs", "simhash_pairs", "embedding_near_dup_lsh",
        "similarity_topk", "multimodal_meta", "pii_redact",
        "repetition_stats", "q12_late_shipments",
        "session_window_stats", "asof_purchase_view",
        "web_ingest_pipeline", "nb_quality_scores", "decontaminate_pairs",
        "leakage_split", "upsample_epoch_shuffle",
        "importance_resample_docs", "incremental_minhash_gate",
        "top_terms_rrf", "pack_bins_report",
        "profile_funnel", "unigram_lm_tokens",
        "pack_bins_exact_roundtrip",
    }
    # in-window (r19): the 44 queries green in r17's own window -- the
    # r15-green rotating slots minus R17_FOLDED, plus sft_pack_spans
    # and the r17 registration substring_dedup_cut
    want = PARITY_PINNED | (r15_green_rotating - R17_FOLDED) | {
        "sft_pack_spans", "substring_dedup_cut",
    }
    missing = want - set(window)
    assert not missing, f"evicted from the driver's 50-query window: {missing}"
    assert len(window) == 50
    assert set(window) == want
    # the 15 r18-changed paths VERDICT r18 ask #3 names must all sit in
    # the r19 window (their first post-change driver row)
    r18_changed_unverified = {
        "domain_pagerank_ranks", "crawl_frontier_gate", "lm_ppl_buckets",
        "incremental_dedup", "curation_pipeline", "boilerplate_line_dedup",
        "connected_components_labels", "sft_pack_spans",
        "substring_dedup_cut", "token_budget_mixture", "doc_signals",
        "paragraph_dedup", "curriculum_assignment", "embedding_moments",
        "embedding_quantize",
    }
    assert r18_changed_unverified <= set(window)
    # below the window: exactly the 44 queries green in r18's own
    # window (CORRECTNESS_r18.json minus the 6 pinned)
    below = set(names[50:])
    assert below == r16_green_rotating
    assert len(below) == 44, len(below)
    # every registered query carries a DuckDB oracle (no no_oracle
    # holes since r15)
    assert set(entrymod.oracle_sql()) == set(names)


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
