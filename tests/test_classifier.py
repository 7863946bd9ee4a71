"""NB hashed-ngram quality classifier (functions/classifier.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_stream_flink_user_address_spark.functions.classifier import (
    apply_nb_quality,
    hashed_ngram_features,
    nb_quality_filter,
    train_nb_quality,
)

GOOD = [
    "the committee published a thorough peer reviewed analysis of climate data",
    "researchers measured the experiment carefully and reported detailed results",
    "this well written article explains the historical context with citations",
    "the study presents rigorous statistical evidence and clear methodology",
]
BAD = [
    "click here buy now cheap pills best price limited offer click",
    "win win win free money casino jackpot click subscribe now now",
    "cheap cheap discount offer buy buy buy click here free free",
    "subscribe like share follow giveaway free iphone click now",
]


@pytest.fixture(scope="module")
def model(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    train = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    weights, info = train_nb_quality(train, n_features=1 << 14)
    return train, weights, info


def test_separates_classes(spark, model):
    _, weights, info = model
    test = spark.createDataFrame(
        [
            (1, "the reviewed analysis reported detailed statistical evidence"),
            (2, "click now free offer buy cheap pills win money"),
        ],
        ["doc_id", "text"],
    )
    scored = {r.doc_id: r.nb_score for r in apply_nb_quality(test, weights, info).collect()}
    assert scored[1] > 0 > scored[2]


def test_filter_keeps_positive_only(spark, model):
    _, weights, info = model
    test = spark.createDataFrame(
        [
            (1, "rigorous methodology with peer reviewed citations"),
            (2, "free free free click click casino jackpot now"),
        ],
        ["doc_id", "text"],
    )
    kept = [r.doc_id for r in nb_quality_filter(test, weights, info).collect()]
    assert kept == [1]


def test_empty_doc_scores_prior(spark, model):
    _, weights, info = model
    test = spark.createDataFrame([(1, ""), (2, "   ")], ["doc_id", "text"])
    out = apply_nb_quality(test, weights, info).collect()
    assert all(r.nb_score == pytest.approx(info["prior"], abs=1e-9) for r in out)


def test_training_order_invariant(spark, model):
    train, _, _ = model
    w1, i1 = train_nb_quality(train, n_features=1 << 14)
    w2, i2 = train_nb_quality(train.orderBy(F.desc("doc_id")), n_features=1 << 14)
    assert i1 == i2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))


def test_single_class_raises(spark):
    df = spark.createDataFrame([(1, "a b", 1), (2, "c d", 1)], ["doc_id", "text", "label"])
    with pytest.raises(ValueError):
        train_nb_quality(df)


def test_short_doc_features(spark):
    """0- and 1-token docs must not hit the descending-sequence trap."""
    df = spark.createDataFrame([(1, ""), (2, "one"), (3, "one two")], ["doc_id", "text"])
    out = df.select("doc_id", F.size(hashed_ngram_features("text")).alias("n")).collect()
    got = {r.doc_id: r.n for r in out}
    assert got == {1: 0, 2: 1, 3: 3}  # 2 unigrams + 1 bigram


def test_xxhash_variant_separates_classes(spark, model):
    train, _, _ = model
    weights, info = train_nb_quality(train, n_features=1 << 14, hash_fn="xxhash")
    assert info["hash_fn"] == "xxhash"
    test = spark.createDataFrame(
        [
            (1, "the reviewed analysis reported detailed statistical evidence"),
            (2, "click now free offer buy cheap pills win money"),
        ],
        ["doc_id", "text"],
    )
    scored = {r.doc_id: r.nb_score for r in apply_nb_quality(test, weights, info).collect()}
    assert scored[1] > 0 > scored[2]


def test_gather_matches_join_scores(spark, model):
    _, weights, info = model
    test = spark.createDataFrame(
        [(1, GOOD[0]), (2, BAD[0]), (3, ""), (4, "one")], ["doc_id", "text"]
    )
    j = {r.doc_id: r.nb_score for r in apply_nb_quality(test, weights, info).collect()}
    g = {
        r.doc_id: r.nb_score
        for r in apply_nb_quality(test, weights, info, method="gather").collect()
    }
    for k in j:
        assert g[k] == pytest.approx(j[k], abs=1e-8)


def test_gather_zero_shuffle_plan(spark, model):
    _, weights, info = model
    test = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    plan = (
        apply_nb_quality(test, weights, info, method="gather")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_bad_hash_fn_raises(spark):
    with pytest.raises(ValueError, match="hash_fn"):
        hashed_ngram_features("text", hash_fn="sha1")


def test_weights_fit_broadcast(model):
    _, weights, info = model
    assert weights.count() <= info["n_features"]


def test_save_load_roundtrip(spark, model, tmp_path):
    from data_stream_flink_user_address_spark.functions.classifier import (
        load_nb_model,
        save_nb_model,
    )

    _, weights, info = model
    save_nb_model(weights, info, str(tmp_path / "m"))
    w2, i2 = load_nb_model(spark, str(tmp_path / "m"))
    assert i2 == info
    assert sorted(map(tuple, w2.collect())) == sorted(map(tuple, weights.collect()))
    test = spark.createDataFrame([(1, GOOD[0]), (2, BAD[0])], ["doc_id", "text"])
    a = {r.doc_id: r.nb_score for r in apply_nb_quality(test, weights, info).collect()}
    b = {r.doc_id: r.nb_score for r in apply_nb_quality(test, w2, i2).collect()}
    assert a == b


class TestStreamingGate:
    def test_epoch_replay_is_idempotent(self, spark, model, tmp_path):
        from data_stream_flink_user_address_spark.functions.classifier import (
            _nb_gate_batch,
        )

        _, weights, info = model
        out = str(tmp_path / "out")
        batch = spark.createDataFrame(
            [(1, GOOD[0]), (2, BAD[0])], ["doc_id", "text"]
        )
        _nb_gate_batch(batch, 0, weights, info, out)
        _nb_gate_batch(batch, 0, weights, info, out)  # replay
        rows = spark.read.parquet(out).collect()
        assert [(r.doc_id, r["__epoch"]) for r in rows] == [(1, 0)]

    def test_streaming_end_to_end(self, spark, model, tmp_path):
        from data_stream_flink_user_address_spark.functions.classifier import (
            streaming_nb_quality_gate,
        )

        _, weights, info = model
        src = str(tmp_path / "src")
        os.makedirs(src)
        out = str(tmp_path / "out")
        schema = T.StructType(
            [T.StructField("doc_id", T.LongType()),
             T.StructField("text", T.StringType())]
        )
        with open(os.path.join(src, "b1.json"), "w") as f:
            f.write(json.dumps({"doc_id": 10, "text": GOOD[1]}) + "\n")
            f.write(json.dumps({"doc_id": 11, "text": BAD[1]}) + "\n")
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).json(src)
        q = streaming_nb_quality_gate(
            stream, weights, info, out, str(tmp_path / "ck")
        )
        try:
            q.processAllAvailable()
            with open(os.path.join(src, "b2.json"), "w") as f:
                f.write(json.dumps({"doc_id": 20, "text": GOOD[2]}) + "\n")
                f.write(json.dumps({"doc_id": 21, "text": BAD[2]}) + "\n")
            q.processAllAvailable()
            q.stop()
            rows = spark.read.parquet(out).collect()
            assert sorted((r.doc_id, r["__epoch"]) for r in rows) == [
                (10, 0), (20, 1),
            ]
        finally:
            q.stop()

    def test_flat_layout_rejected(self, spark, model, tmp_path):
        from data_stream_flink_user_address_spark.functions.classifier import (
            streaming_nb_quality_gate,
        )

        _, weights, info = model
        out = str(tmp_path / "flat")
        spark.createDataFrame([(1, "x")], ["doc_id", "text"]).write.parquet(out)
        stream = spark.readStream.format("rate").load()
        with pytest.raises(ValueError, match="flat-append"):
            streaming_nb_quality_gate(
                stream, weights, info, out, str(tmp_path / "ck")
            )


def test_apply_broadcast_plan(spark, model):
    _, weights, info = model
    test = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    plan = (
        apply_nb_quality(test, weights, info)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_gather_handles_null_text(spark, model):
    """NULL text must score prior on BOTH paths, not crash the gather
    UDF (regression: len(None) TypeError in the Python worker)."""
    _, weights, info = model
    test = spark.createDataFrame(
        [(1, None), (2, GOOD[0])], ["doc_id", "text"]
    ).withColumn("text", F.col("text").cast("string"))
    j = {r.doc_id: r.nb_score for r in apply_nb_quality(test, weights, info).collect()}
    g = {
        r.doc_id: r.nb_score
        for r in apply_nb_quality(test, weights, info, method="gather").collect()
    }
    assert j[1] == pytest.approx(info["prior"], abs=1e-9)
    assert g[1] == pytest.approx(info["prior"], abs=1e-9)
    assert g[2] == pytest.approx(j[2], abs=1e-8)


def test_min_df_prunes_weight_table_not_denominators(spark, model):
    """min_df shrinks the WEIGHT TABLE only: smoothing denominators
    still count every occurrence, and a pruned feature scores as
    unseen (default_weight) at apply time -- so pruned-model scores
    equal scoring with the full model's table manually filtered."""
    train, weights_full, info_full = model
    weights_pruned, info_pruned = train_nb_quality(
        train, n_features=1 << 14, min_df=2
    )
    n_full, n_pruned = weights_full.count(), weights_pruned.count()
    assert n_pruned < n_full  # the fixture vocab has singleton features
    # denominators and scalars unchanged by the prune
    for k in ("prior", "default_weight", "pos_total", "neg_total"):
        assert info_pruned[k] == info_full[k], k
    assert info_pruned["min_df"] == 2
    test = spark.createDataFrame(
        [(1, "the reviewed analysis reported detailed statistical evidence"),
         (2, "click now free offer buy cheap pills win money"),
         (3, "")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.nb_score
        for r in apply_nb_quality(test, weights_pruned, info_pruned).collect()
    }
    # equivalence oracle: full model with rows below min_df dropped
    kept = weights_full.join(
        weights_pruned.select("feature"), "feature", "left_semi"
    )
    want = {
        r.doc_id: r.nb_score
        for r in apply_nb_quality(test, kept, info_full).collect()
    }
    assert got == want
    assert got[1] > 0 > got[2]  # still separates classes after pruning


def test_features_col_matches_inline_featurize(spark, model):
    """r19 shared-featurize path: training/applying on a precomputed
    hashed_ngram_features column must reproduce the inline path's
    weights and scores exactly (same arrays -> same counts -> same
    doubles)."""
    train, weights, info = model
    feats = train.select(
        "doc_id", "label", hashed_ngram_features("text", 1 << 14).alias("__f")
    )
    w2, i2 = train_nb_quality(feats, n_features=1 << 14, features_col="__f")
    assert i2 == info
    base_w = {r["feature"]: r["weight"] for r in weights.collect()}
    got_w = {r["feature"]: r["weight"] for r in w2.collect()}
    assert got_w == base_w
    base = {
        r["doc_id"]: r["nb_score"]
        for r in apply_nb_quality(train, weights, info).collect()
    }
    got = {
        r["doc_id"]: r["nb_score"]
        for r in apply_nb_quality(
            feats, w2, i2, features_col="__f"
        ).collect()
    }
    assert got == base
