"""Deterministic training-data ordering: epoch shuffle + shard layout.

Engine extension beyond the reference surface (BASELINE.json north
star): a training run over a 100 TB corpus needs a REPRODUCIBLE global
example order (exact resume after preemption, bitwise-identical reruns)
that still differs per epoch.  The naive ``orderBy(rand())`` fails both
requirements at scale: ``rand()`` is not stable across retries of a
task, and a global ``orderBy`` is a range exchange whose sampling pass
and skewed ranges are pure overhead when no consumer needs a total
order across shard boundaries.

Shape used here instead:

- order key  = md5(key | seed | epoch)  -- deterministic, uniform,
  re-derivable by any engine (the repo-wide ``_md5_long`` idiom, DuckDB
  bit-for-bit reproducible);
- shard      = order_key % n_shards     -- balanced by hash uniformity,
  no sampling pass, no skew (keys are unique);
- layout     = ONE hash-partition shuffle on the shard id + a local
  ``sortWithinPartitions(shard, order_key)``.

Global order is shard-major: readers consume shard 0's file in order,
then shard 1's, ... -- exactly the contract of sharded training
loaders, obtained without any range exchange.  Changing ``epoch``
reshuffles everything (both shard membership and intra-shard order)
while staying one-shuffle cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_long


def epoch_order_key(key: Column, seed: int = 42, epoch: int = 0) -> Column:
    """Deterministic 60-bit order key for (row key, seed, epoch).

    Uniform over [0, 2^60); distinct row keys collide with ~2^-60
    probability, so the key alone is (almost) a total order -- callers
    still tie-break on the row key for exactness.
    """
    return _md5_long(
        F.concat(key.cast("string"), F.lit(f"|{seed}|{epoch}"))
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 42,
    epoch: int = 0,
    n_shards: int = 32,
    order_col: str = "epoch_order",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministically shuffle ``df`` for one training epoch.

    Output = input columns + ``order_col`` (the 60-bit order key) +
    ``shard_col`` (int in [0, n_shards)), hash-partitioned on the shard
    id and locally sorted by (shard, order, key) -- shard-major global
    order with exactly ONE shuffle and no range exchange.  Same
    (seed, epoch) is bitwise reproducible; any other epoch gives an
    independent permutation.
    """
    order = epoch_order_key(F.col(key_col), seed, epoch)
    out = (
        df.withColumn(order_col, order)
        .withColumn(shard_col, (F.col(order_col) % n_shards).cast("int"))
    )
    return out.repartition(n_shards, F.col(shard_col)).sortWithinPartitions(
        shard_col, order_col, key_col
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int = 4,
    key_col: str = "doc_id",
    seed: int = 42,
    epoch: int = 0,
    n_shards: int = 32,
    accuracy: int = 10000,
    null_stage: int | None = None,
) -> DataFrame:
    """Deterministic curriculum ordering: global example order is
    STAGE-major (stage 0 = lowest ``score_col`` quantile first; negate
    the score for hard-first), with an independent :func:`epoch_shuffle`
    permutation inside each stage -- curriculum learning's data
    contract (easy-to-hard progression, shuffled within difficulty
    bands, reproducible across reruns and resumable after preemption).

    NULL scores (a difficulty scorer that could not rate the doc) are
    kept -- an ordering must not silently lose rows -- and land in
    ``null_stage`` (default: the LAST stage, ``n_stages - 1``, so
    unrated docs never jump the easy-first queue); the quantile cuts
    themselves ignore NULLs (``percentile_approx`` semantics).

    Shape: stage boundaries come from ONE ``percentile_approx``
    aggregate (GK sketch, mergeable partials, error ``1/accuracy``);
    the 1-row cut frame broadcasts back and every row assigns its
    stage ROW-LOCALLY by counting cuts below its score -- the
    :func:`..sampling.quality_bucket_cuts` idiom, so no window, no
    global sort, and the only wide operation is the same single hash
    exchange :func:`epoch_shuffle` pays.  Two corpus passes total
    (sketch + shuffle).

    Output = input + ``stage`` + ``epoch_order`` + ``shard``,
    hash-partitioned on (stage, shard) and locally sorted by
    (stage, shard, order, key): readers consume ``stage=0/shard=0..N``
    then ``stage=1/...`` for stage-major order without a range
    exchange.
    """
    fracs = F.array(*[F.lit(i / n_stages) for i in range(1, int(n_stages))])
    cuts = df.select(
        F.percentile_approx(F.col(score_col), fracs, F.lit(int(accuracy))).alias(
            "__cuts"
        )
    )
    counted = F.aggregate(
        "__cuts",
        F.lit(0),
        lambda acc, cut: acc + F.when(F.col(score_col) > cut, 1).otherwise(0),
    )
    stage = F.when(
        F.col(score_col).isNull(),
        F.lit(int(n_stages) - 1 if null_stage is None else int(null_stage)),
    ).otherwise(counted)
    out = (
        df.join(F.broadcast(cuts))
        .withColumn("stage", stage.cast("int"))
        .drop("__cuts")
        .withColumn("epoch_order", epoch_order_key(F.col(key_col), seed, epoch))
    )
    out = out.withColumn("shard", (F.col("epoch_order") % n_shards).cast("int"))
    return out.repartition(
        int(n_stages) * int(n_shards), F.col("stage"), F.col("shard")
    ).sortWithinPartitions("stage", "shard", "epoch_order", key_col)


def write_curriculum_shards(
    df: DataFrame,
    path: str,
    score_col: str,
    n_stages: int = 4,
    key_col: str = "doc_id",
    seed: int = 42,
    epoch: int = 0,
    n_shards: int = 32,
) -> DataFrame:
    """Materialize a curriculum epoch: ``path/stage=S/shard=K/``
    parquet, rows of each file in epoch order (same already-partitioned
    + already-sorted write contract as :func:`write_epoch_shards`).
    Returns the ``(stage, shard, n_rows)`` manifest computed by
    re-reading the written layout, keeping the corpus scan single-pass.
    """
    ordered = curriculum_order(
        df, score_col, n_stages, key_col, seed, epoch, n_shards
    )
    ordered.write.mode("overwrite").partitionBy("stage", "shard").parquet(path)
    spark = df.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("stage", "shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("stage", "shard")
    )


def write_epoch_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    seed: int = 42,
    epoch: int = 0,
    n_shards: int = 32,
) -> DataFrame:
    """Materialize one epoch's shards: ``path/shard=K/`` parquet, each
    shard's rows stored in epoch order (parquet preserves the
    partition-local sort through a ``partitionBy`` write because the
    frame is already partitioned AND sorted by the shard id -- one file
    per shard value per task, rows in encounter order).

    Returns the shard manifest -- ``(shard, n_rows, first_order,
    last_order)``, the order-key range each shard covers -- computed
    by re-reading the written files (NOT from
    the input plan: the write and a plan-side manifest would each run
    the upstream scan once; re-reading costs one cheap metadata-sized
    pass and keeps the corpus scan single-pass).
    """
    shuffled = epoch_shuffle(df, key_col, seed, epoch, n_shards)
    shuffled.write.mode("overwrite").partitionBy("shard").parquet(path)
    spark = df.sparkSession
    back = spark.read.parquet(path)
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("epoch_order").alias("first_order"),
            F.max("epoch_order").alias("last_order"),
        )
        .orderBy("shard")
    )
