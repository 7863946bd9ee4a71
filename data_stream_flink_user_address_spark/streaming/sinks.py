"""Keyed upsert sinks -- Spark re-expression of reference Sink/MongoSink.java.

Reference semantics (``Sink/MongoSink.java:44-63``): per record,
``updateOne({key: doc[key]}, {$set: doc}, upsert=true)`` -- last-write-wins
keyed upsert, idempotent per key, no transactions.  Three instances:
userAddress (key userId), userCountByState (key state), userCountByCountry
(key country) -- ``Main.java:170-179``.

Spark mapping: ``writeStream.foreachBatch`` with a per-batch keyed merge.
The default store here is a self-contained parquet key-value table
(read-merge-rewrite, atomic per bucket directory); on a real deployment
the same interface fronts Delta ``MERGE`` or the Mongo Spark connector --
the batch-level dedup logic is identical.

Micro-batch retries replay a batch: the merge is idempotent per key, so
at-least-once delivery converges exactly like the reference's upsert.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, order_col: str | None) -> DataFrame:
    """Collapse a batch to one row per key (last-write-wins).

    ``order_col`` defines "last"; None means any row may win (matches the
    reference's nondeterministic per-record ordering across parallel
    sink subtasks).
    """
    if order_col is None:
        return df.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


class KeyedUpsertSink:
    """Parquet-backed keyed upsert table (MongoSink.java analogue).

    ``path`` holds the table hash-bucketed by key into ``n_buckets``
    partition directories (``__bucket=k/``).  ``apply`` merges a batch:
    new keys inserted, existing keys overwritten ($set-with-upsert
    semantics).  Only the buckets containing the batch's keys are read
    (partition pruning) and rewritten (dynamic partition overwrite) --
    per-batch cost is O(touched buckets), not O(table), which is what
    keeps a continuously-upserting sink viable as the keyed table grows.

    Durability limits (by design, matching the reference's
    no-transactions Mongo sink): SINGLE writer on a LOCAL/HDFS-like
    filesystem only.  ``_read_raw`` probes bucket dirs via
    ``os.listdir``, so ``path`` must be driver-visible; and dynamic
    partition overwrite is atomic per bucket directory but not across
    buckets -- a crash mid-commit can leave some touched buckets new and
    others old (replaying the batch converges, since the merge is
    idempotent per key).  For multi-writer or crash-transactional
    deployments swap this class for Delta ``MERGE`` behind the same
    ``apply(df)`` interface.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        order_col: str | None = None,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.order_col = order_col
        self.n_buckets = n_buckets

    def _bucket(self):
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets))

    def _read_raw(self) -> DataFrame | None:
        if not os.path.isdir(self.path) or not any(
            e.startswith("__bucket=") for e in os.listdir(self.path)
        ):
            return None
        return self.spark.read.parquet(self.path)

    def read(self) -> DataFrame | None:
        """Current table contents (without the internal bucket column)."""
        raw = self._read_raw()
        return None if raw is None else raw.drop("__bucket")

    def apply(self, batch_df: DataFrame) -> None:
        incoming = latest_per_key(batch_df, self.key, self.order_col).withColumn(
            "__bucket", self._bucket()
        )
        current = self._read_raw()
        if current is None:
            merged = incoming
        else:
            touched = [r[0] for r in incoming.select("__bucket").distinct().collect()]
            # partition pruning: only touched bucket dirs are scanned
            survivors = (
                current.filter(F.col("__bucket").isin(touched))
                .join(incoming.select(self.key), on=self.key, how="left_anti")
            )
            # new batch wins on key collision (MongoSink $set upsert)
            merged = incoming.unionByName(survivors, allowMissingColumns=False)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(self.path)
        )

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.apply(batch_df)

        return fn


def upsert_foreach_batch(spark: SparkSession, path: str, key: str, order_col: str | None = None):
    """One-call ``foreachBatch`` function factory (K1 instances K2-K4)."""
    return KeyedUpsertSink(spark, path, key, order_col).foreach_batch()


def console_sink(df: DataFrame, **options):
    """K5 -- reference's System.out.println debug sink (Main.java:147,164)."""
    return df.writeStream.format("console").options(**options)
