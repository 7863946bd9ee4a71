"""Unigram-LM quality scorer invariants."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.functions.text import (
    unigram_logprob_scores,
)


def _scores(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in unigram_logprob_scores(df, **kw).collect()}


def test_common_tokens_score_lower_than_rare(spark):
    rows = [
        (1, "the the the the"),        # most frequent token only
        (2, "the the the zebra"),      # one rarer token
        (3, "qux zap wib ler"),        # all singletons
    ]
    got = _scores(spark, rows)
    assert got[1].logprob_score < got[2].logprob_score < got[3].logprob_score
    assert got[1].n_tokens == 4


def test_oov_costs_more_than_any_in_vocab_token(spark):
    # vocab_limit 2 -> top tokens by (count desc, token asc) = aa, bb;
    # an all-OOV doc must score strictly worse than an all-in-vocab one
    # because the 0.5/total floor sits below the rarest retained token
    rows = [
        (1, "aa aa bb"),
        (2, "zz yy xx"),
    ]
    got = _scores(spark, rows, vocab_limit=2)
    assert got[2].logprob_score > got[1].logprob_score


def test_deterministic_across_runs(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} filler common common") for i in range(50)]
    a = _scores(spark, rows)
    b = _scores(spark, rows)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].logprob_score == b[k].logprob_score
