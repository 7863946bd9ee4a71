"""Doc-level cross-corpus decontamination (train vs eval benchmark).

Planted ground truth: eval docs are copies / light paraphrases of a
known subset of train docs; the operator must drop exactly that subset
(at min_agreement thresholds where MinHash recall is certain) and keep
everything else.
"""

import pytest
from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.dedup import (
    cross_corpus_decontaminate,
)


def _mk(spark, rows, extra_cols=None):
    return spark.createDataFrame(rows, ["doc_id", "text"] + (extra_cols or []))


BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while autumn leaves drift slowly across the quiet water"
)


@pytest.fixture(scope="module")
def corpora(spark):
    train = _mk(
        spark,
        [
            (1, BASE),  # exact copy in eval
            (2, BASE.replace("autumn", "winter")),  # near-dup of eval 101
            (3, "completely unrelated text about spark physical plans and shuffles"),
            (4, "another unrelated document mentioning tokenizers and corpora"),
            (5, "ab"),  # shorter than shingle n: can never match
        ],
    )
    ev = _mk(
        spark,
        [
            (101, BASE),
            (102, "eval-only content that matches nothing in the training set at all"),
        ],
    )
    return train, ev


def test_exact_and_near_copies_removed(corpora):
    train, ev = corpora
    clean, pairs = cross_corpus_decontaminate(
        train, ev, min_agreement=0.5, num_hashes=16, bands=8, rows_per_band=2
    )
    kept = sorted(r.doc_id for r in clean.select("doc_id").collect())
    assert 1 not in kept  # exact copy always removed
    assert set(kept) <= {2, 3, 4, 5}
    assert {3, 4, 5} <= set(kept)  # unrelated + sub-shingle docs survive
    p = {(r.doc_id, r.eval_doc_id) for r in pairs.collect()}
    assert (1, 101) in p
    assert all(e != 102 for (_, e) in p)  # the no-match eval doc pairs with nothing


def test_exact_band_mode_no_rescore(corpora):
    train, ev = corpora
    clean, pairs = cross_corpus_decontaminate(train, ev, min_agreement=None)
    assert 1 not in {r.doc_id for r in clean.collect()}
    assert all(r.agreement == 1.0 for r in pairs.collect())


def test_agreement_one_for_exact_copy(corpora):
    train, ev = corpora
    _, pairs = cross_corpus_decontaminate(train, ev, min_agreement=0.1)
    exact = [r for r in pairs.collect() if r.doc_id == 1 and r.eval_doc_id == 101]
    assert exact and exact[0].agreement == 1.0


def test_clean_plus_pairs_partition_train(corpora):
    """Every train doc is either kept or appears in pairs -- no loss."""
    train, ev = corpora
    clean, pairs = cross_corpus_decontaminate(train, ev, min_agreement=0.5)
    kept = {r.doc_id for r in clean.collect()}
    dropped = {r.doc_id for r in pairs.collect()}
    assert kept | dropped == {1, 2, 3, 4, 5}
    assert kept & dropped == set()


def test_schema_passthrough(spark, corpora):
    train, ev = corpora
    t2 = train.withColumn("source", F.lit("web"))
    clean, _ = cross_corpus_decontaminate(t2, ev)
    assert clean.columns == t2.columns


def test_broadcast_eval_plan_shape(corpora):
    """The candidate join must be a broadcast join (no train-side shuffle)."""
    train, ev = corpora
    _, pairs = cross_corpus_decontaminate(
        train, ev, min_agreement=0.5, materialize_pairs=False
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the big (train) side must not be exchanged before the join: the only
    # exchange in the candidate plan is broadcast + the final distinct
    assert plan.count("Exchange hashpartitioning") <= 1
