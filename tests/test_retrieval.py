"""BM25 retrieval (functions/retrieval.py): scoring semantics + plan."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.functions.retrieval import bm25_topk


def _docs(spark):
    rows = [
        (0, "spark spark spark runs fast"),        # tf=3 for 'spark'
        (1, "spark joins tables"),                  # tf=1
        (2, "tables without the term"),             # no match
        (3, "spark spark appears here twice ok"),   # tf=2
        (4, "rare gem inside"),                     # matches 'gem' only
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_by_tf_and_idf(spark):
    got = bm25_topk(_docs(spark), ["spark"], k=10).collect()
    ids = [r.doc_id for r in got]
    # only matching docs appear; higher tf ranks higher (equal dl ~ 5-6)
    assert set(ids) == {0, 1, 3}
    assert ids[0] == 0 and ids[1] == 3 and ids[2] == 1
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].score > got[1].score > got[2].score > 0


def test_bm25_rare_term_outweighs_common(spark):
    # 'gem' df=1 vs 'spark' df=3: one gem match must outscore one spark
    # match at comparable length
    got = {r.doc_id: r.score for r in
           bm25_topk(_docs(spark), ["spark", "gem"], k=10).collect()}
    assert got[4] > got[1]


def test_bm25_no_match_returns_empty(spark):
    assert bm25_topk(_docs(spark), ["absent"], k=5).count() == 0


def test_bm25_plan_partial_topk_no_global_window_over_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    topk = bm25_topk(docs, ["hash", "join"], k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        topk.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan  # partial per-partition top-k
    assert "CartesianProduct" not in plan
    # the only Window is the rank over the k survivors, AFTER the limit
    assert plan.count("Window") <= 2


class TestRrfFuse:
    def test_fusion_prefers_doc_ranked_by_both(self, spark):
        from data_stream_flink_user_address_spark.functions.retrieval import (
            rrf_fuse,
        )

        a = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"]
        )
        b = spark.createDataFrame(
            [(2, 1), (4, 2), (1, 3)], ["doc_id", "rank"]
        )
        out = rrf_fuse([a, b], k=60)
        rows = {r.doc_id: r for r in out.collect()}
        # docs 1 and 2 appear in both lists -> outrank single-list docs
        assert rows[1].rank <= 2 and rows[2].rank <= 2
        assert rows[3].rank > 2 and rows[4].rank > 2
        # exact RRF arithmetic
        assert rows[1].rrf_score == round(1 / 61 + 1 / 63, 9)

    def test_single_list_preserves_order(self, spark):
        from data_stream_flink_user_address_spark.functions.retrieval import (
            rrf_fuse,
        )

        a = spark.createDataFrame([(7, 1), (8, 2)], ["doc_id", "rank"])
        out = rrf_fuse([a]).collect()
        assert [(r.doc_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
            (7, 1), (8, 2),
        ]

    def test_topk_cut_and_empty_input(self, spark):
        import pytest as _pytest

        from data_stream_flink_user_address_spark.functions.retrieval import (
            rrf_fuse,
        )

        a = spark.createDataFrame([(i, i) for i in range(1, 6)], ["doc_id", "rank"])
        assert rrf_fuse([a], topk=2).count() == 2
        with _pytest.raises(ValueError):
            rrf_fuse([])
