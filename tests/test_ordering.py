"""Deterministic epoch shuffle / shard layout (functions/ordering.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.ordering import (
    epoch_order_key,
    epoch_shuffle,
    write_epoch_shards,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_bitwise_reproducible(docs):
    a = epoch_shuffle(docs, n_shards=8).collect()
    b = epoch_shuffle(docs, n_shards=8).collect()
    assert a == b


def test_epochs_differ(docs):
    a = [r.doc_id for r in epoch_shuffle(docs, epoch=0, n_shards=8).collect()]
    b = [r.doc_id for r in epoch_shuffle(docs, epoch=1, n_shards=8).collect()]
    assert a != b
    assert sorted(a) == sorted(b)  # permutation, no loss


def test_seeds_differ(docs):
    a = [r.doc_id for r in epoch_shuffle(docs, seed=1, n_shards=8).collect()]
    b = [r.doc_id for r in epoch_shuffle(docs, seed=2, n_shards=8).collect()]
    assert a != b


def test_shard_balance_and_coverage(docs):
    n = docs.count()
    out = epoch_shuffle(docs, n_shards=8)
    sizes = {r.shard: r.n for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == n
    # hash-uniform shards: no shard more than 2x the mean on 500 keys
    mean = n / 8
    assert max(sizes.values()) <= 2 * mean
    assert min(sizes.values()) >= mean / 3


def test_shard_assignment_matches_order_key(docs):
    out = epoch_shuffle(docs, n_shards=8)
    bad = out.filter(F.col("shard") != (F.col("epoch_order") % 8).cast("int"))
    assert bad.count() == 0


def test_order_key_duckdb_parity(spark, docs):
    """The order key is re-derivable bit-for-bit outside Spark."""
    got = {
        r.doc_id: r.k
        for r in docs.select(
            "doc_id", epoch_order_key(F.col("doc_id"), seed=7, epoch=3).alias("k")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            f"""
            SELECT doc_id,
                   ('0x' || substr(md5(doc_id::VARCHAR || '|7|3'), 1, 15))::BIGINT
            FROM read_parquet('{SF}/documents.parquet')
            """
        ).fetchall()
    )
    assert got == want


def test_written_shards_sorted(docs, tmp_path):
    path = str(tmp_path / "epoch0")
    manifest = write_epoch_shards(docs, path, n_shards=4).collect()
    assert sorted(r.shard for r in manifest) == [0, 1, 2, 3]
    assert sum(r.n_rows for r in manifest) == docs.count()
    spark = docs.sparkSession
    for shard in range(4):
        orders = [
            r.epoch_order
            for r in spark.read.parquet(f"{path}/shard={shard}").select("epoch_order").collect()
        ]
        assert orders == sorted(orders)  # file preserves epoch order


def test_one_shuffle_plan(docs):
    plan = epoch_shuffle(docs, n_shards=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()


class TestCurriculum:
    """curriculum_order / write_curriculum_shards: stage-major
    easy-to-hard order, epoch_shuffle permutation within stages."""

    def _scored(self, docs):
        # deterministic score with unambiguous quartile boundaries
        return docs.select("doc_id", (F.col("doc_id") % 100).alias("score"))

    def test_stage_assignment_monotone(self, docs):
        from data_stream_flink_user_address_spark.functions.ordering import (
            curriculum_order,
        )

        out = curriculum_order(
            self._scored(docs), "score", n_stages=4, n_shards=4
        )
        rows = out.select("score", "stage").collect()
        # stages partition the score axis: every stage-s score is <=
        # every stage-(s+1) score
        by_stage = {}
        for r in rows:
            by_stage.setdefault(r.stage, []).append(r.score)
        stages = sorted(by_stage)
        assert stages == [0, 1, 2, 3]
        for lo, hi in zip(stages, stages[1:]):
            assert max(by_stage[lo]) <= min(by_stage[hi])

    def test_bitwise_reproducible_and_epochs_differ(self, docs):
        from data_stream_flink_user_address_spark.functions.ordering import (
            curriculum_order,
        )

        scored = self._scored(docs)
        a = curriculum_order(scored, "score", n_shards=4).collect()
        b = curriculum_order(scored, "score", n_shards=4).collect()
        assert a == b
        c = curriculum_order(scored, "score", n_shards=4, epoch=1).collect()
        assert [r.doc_id for r in a] != [r.doc_id for r in c]
        # epoch changes the within-stage order, never the stage
        assert {r.doc_id: r.stage for r in a} == {r.doc_id: r.stage for r in c}

    def test_written_layout_stage_major(self, docs, tmp_path):
        from data_stream_flink_user_address_spark.functions.ordering import (
            write_curriculum_shards,
        )

        path = str(tmp_path / "curr0")
        manifest = write_curriculum_shards(
            self._scored(docs), path, "score", n_stages=2, n_shards=2
        ).collect()
        assert [(r.stage, r.shard) for r in manifest] == [
            (0, 0), (0, 1), (1, 0), (1, 1),
        ]
        assert sum(r.n_rows for r in manifest) == docs.count()
        spark = docs.sparkSession
        orders = [
            r.epoch_order
            for r in spark.read.parquet(f"{path}/stage=0/shard=1")
            .select("epoch_order").collect()
        ]
        assert orders == sorted(orders)  # file preserves epoch order

    def test_two_pass_no_range_exchange(self, docs):
        from data_stream_flink_user_address_spark.functions.ordering import (
            curriculum_order,
        )

        plan = (
            curriculum_order(self._scored(docs), "score", n_shards=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "rangepartitioning" not in plan.lower()
        # the corpus rides exactly ONE hash exchange (the layout
        # repartition); the sketch side is a SinglePartition 1-row
        # aggregate that broadcasts back -- pin all three so a second
        # corpus-wide exchange (or a non-broadcast cuts join) fails
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Exchange SinglePartition" in plan, plan
        assert "BroadcastExchange" in plan, plan

    def test_null_scores_kept_in_declared_stage(self, spark, docs):
        """NULL difficulty scores must not be silently front-loaded:
        default lands them in the LAST stage; null_stage overrides."""
        from data_stream_flink_user_address_spark.functions.ordering import (
            curriculum_order,
        )

        scored = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, None)
            .otherwise(F.col("doc_id") % 100)
            .cast("int")
            .alias("score"),
        )
        out = curriculum_order(scored, "score", n_stages=4, n_shards=4)
        rows = out.select("doc_id", "score", "stage").collect()
        assert len(rows) == docs.count()  # no rows lost
        assert all(r.stage == 3 for r in rows if r.score is None)
        out0 = curriculum_order(
            scored, "score", n_stages=4, n_shards=4, null_stage=0
        )
        assert all(
            r.stage == 0
            for r in out0.select("score", "stage").collect()
            if r.score is None
        )
