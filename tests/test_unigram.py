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


def _bigram(spark, rows, **kw):
    from data_stream_flink_user_address_spark.functions.text import (
        bigram_logprob_scores,
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r.doc_id: r for r in bigram_logprob_scores(df, **kw).collect()}


def test_bigram_hand_computed_two_docs(spark):
    import math
    # corpus: doc1 "a b a b", doc2 "a b"  ->  V = 2
    # bigrams: (a,b) x3, (b,a) x1;  c1: a->3, b->1
    # p(b|a) = (3+1)/(3+2) = 0.8 ; p(a|b) = (1+1)/(1+2) = 2/3
    got = _bigram(spark, [(1, "a b a b"), (2, "a b")])
    lp_ab = -math.log2(4 / 5)
    lp_ba = -math.log2(2 / 3)
    assert got[1].n_bigrams == 3
    assert got[1].bigram_logprob == round((2 * lp_ab + lp_ba) / 3, 6)
    assert got[2].n_bigrams == 1
    assert got[2].bigram_logprob == round(lp_ab, 6)


def test_bigram_short_docs_omitted(spark):
    got = _bigram(spark, [(1, "solo"), (2, ""), (3, "a b")])
    assert set(got) == {3}


def test_bigram_scrambled_text_scores_worse_than_fluent(spark):
    # 20 fluent docs establish strong adjacency; one scrambled doc uses
    # the SAME unigrams in never-seen orders -> unigram filter is blind
    # to it, the bigram filter is not
    fluent = [(i, "the cat sat on the mat") for i in range(20)]
    scrambled = [(99, "mat the on sat cat the")]
    got = _bigram(spark, fluent + scrambled)
    assert got[99].bigram_logprob > got[0].bigram_logprob


def test_bigram_instance_weighting_matches_per_instance_mean(spark):
    import math
    # "x x x": bigram (x,x) twice in one doc -- the grouped n-weighted
    # mean must equal averaging over the 2 instances (same value here,
    # but n_bigrams must count instances, not distinct bigrams)
    got = _bigram(spark, [(1, "x x x")])
    assert got[1].n_bigrams == 2
    assert got[1].bigram_logprob == round(-math.log2((2 + 1) / (2 + 1 * 1)), 6)


# ---------------- stupid-backoff scorer (r15b) ----------------


def _sb(spark, score_rows, ref_rows=None, **kw):
    from data_stream_flink_user_address_spark.functions.text import (
        stupid_backoff_scores,
    )

    df = spark.createDataFrame(score_rows, "doc_id long, text string")
    ref = (
        None
        if ref_rows is None
        else spark.createDataFrame(ref_rows, "doc_id long, text string")
    )
    return {
        r.doc_id: r for r in stupid_backoff_scores(df, ref_df=ref).collect()
    }


def test_backoff_hand_computed_held_out(spark):
    """Reference 'a b' x2 + 'a c'; scored doc 'a b c' held out:
    pos0 'a' = uni(3/8); 'b|a' = c2/c1 = 2/3 (hit); 'c|b' unseen
    bigram, seen unigram -> 0.4 * (1/8) (backoff)."""
    import math

    ref = [(100, "a b"), (101, "a b"), (102, "a c")]
    got = _sb(spark, [(1, "a b c")], ref_rows=ref)[1]
    # ref tokens: a=3, b=2, c=1, T=6... recount: 'a b','a b','a c'
    # -> a:3 b:2 c:1, T=6; bigrams: (a,b):2 (a,c):1; c1(a)=3, c1(b)=0
    want = (
        -math.log2(3 / 6) + -math.log2(2 / 3) + -math.log2(0.4 * (1 / 6))
    ) / 3
    assert got["n_tokens"] == 3
    assert got["n_bigram_hit"] == 1
    assert got["n_backoff"] == 1
    assert got["n_oov"] == 0
    assert abs(got["lm_logprob"] - round(want, 6)) < 1e-9


def test_oov_floor_and_counts(spark):
    """'z z' is fully OOV against the reference: pos0 z = 0.5/T, then
    bigram (z,z) unseen AND unigram z unseen -> alpha * 0.5/T."""
    import math

    ref = [(100, "a b a")]
    got = _sb(spark, [(1, "z z")], ref_rows=ref)[1]
    t = 3.0
    want = (-math.log2(0.5 / t) + -math.log2(0.4 * 0.5 / t)) / 2
    assert got["n_oov"] == 2 and got["n_backoff"] == 1
    assert got["n_bigram_hit"] == 0
    assert abs(got["lm_logprob"] - round(want, 6)) < 1e-9


def test_self_trained_never_backs_off(spark):
    """Scoring the training corpus itself: every observed bigram has
    c2 >= 1, so the backoff path never fires (the reason the driver
    query holds out a split)."""
    rows = [(1, "x y z"), (2, "y z x y")]
    got = _sb(spark, rows)
    for r in got.values():
        assert r["n_backoff"] == 0 and r["n_oov"] == 0
        assert r["n_bigram_hit"] == r["n_tokens"] - 1


def test_scrambled_held_out_scores_worse_than_fluent(spark):
    """The property the Laplace bigram scorer has in-domain, now on
    held-out text: fluent word order follows the reference's bigram
    table, scrambled order of the SAME tokens backs off."""
    ref = [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    got = _sb(
        spark,
        [(1, "the quick brown fox"), (2, "fox brown quick the")],
        ref_rows=ref,
    )
    assert got[1]["lm_logprob"] < got[2]["lm_logprob"]
    assert got[1]["n_bigram_hit"] > got[2]["n_bigram_hit"]


def test_empty_docs_omitted_single_token_kept(spark):
    got = _sb(spark, [(1, "   "), (2, "a")], ref_rows=[(100, "a b")])
    assert 1 not in got
    assert got[2]["n_tokens"] == 1 and got[2]["n_bigram_hit"] == 0


def test_backoff_randomized_matches_python_replica(spark):
    """Randomized ref/held corpora vs a from-scratch Python replica of
    the full cascade (counts, backoff CASE, n-weighted -log2 mean)."""
    import math
    import random

    rng = random.Random(1511)
    vocab = ["a", "b", "c", "d", "e", "f"]
    ref_rows = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(12)
    ]
    held_rows = [
        (i, " ".join(rng.choice(vocab + ["q", "z"])  # q/z are OOV
                     for _ in range(rng.randint(1, 10))))
        for i in range(25)
    ]
    got = _sb(spark, held_rows, ref_rows=ref_rows)

    cu, c2, c1 = {}, {}, {}
    for _, text in ref_rows:
        toks = text.split()
        for t in toks:
            cu[t] = cu.get(t, 0) + 1
        for p, c in zip(toks, toks[1:]):
            c2[(p, c)] = c2.get((p, c), 0) + 1
            c1[p] = c1.get(p, 0) + 1
    T = sum(cu.values())

    for did, text in held_rows:
        toks = text.split()
        logps, hits, backoffs, oovs = [], 0, 0, 0
        for i, cur in enumerate(toks):
            uni = (cu.get(cur, 0) or 0.5) / T
            if cu.get(cur) is None:
                oovs += 1
            if i == 0:
                s = uni
            elif (toks[i - 1], cur) in c2:
                s = c2[(toks[i - 1], cur)] / c1[toks[i - 1]]
                hits += 1
            else:
                s = 0.4 * uni
                backoffs += 1
            logps.append(-math.log2(s))
        r = got[did]
        assert r["n_tokens"] == len(toks)
        assert r["n_bigram_hit"] == hits, did
        assert r["n_backoff"] == backoffs, did
        assert r["n_oov"] == oovs, did
        assert abs(r["lm_logprob"] - round(sum(logps) / len(logps), 6)) < 1e-7, did


def test_backoff_empty_reference_raises(spark):
    """A token-free reference has no LM to score under: the guard must
    fail loudly at execution instead of NULL-poisoning lm_logprob
    (ADVICE r15) -- and it is an expression, not an extra driver
    action, so a self-trained 100 TB run pays no second corpus scan."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception)) as ei:
        _sb(spark, [(1, "a b c")], ref_rows=[(100, ""), (101, "   ")])
    assert "reference corpus has no tokens" in str(ei.value)
