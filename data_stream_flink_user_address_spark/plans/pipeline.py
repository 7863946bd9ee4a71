"""Full reference topology as a one-call recipe (Main.java:45-183).

Two JSON streams (user, address) -> stateful emit-per-event join ->
  (a) tumbling 1-min count by state   -> keyed upsert (key=state)
  (b) tumbling 1-min count by country -> keyed upsert (key=country)
  (c) passthrough snapshots           -> keyed upsert (key=userId)

Differences from the reference, by design (SURVEY.md SS7 item 8):
- windows are (window x dimension) grouped aggs, not parallelism-1
  ``windowAll`` -- identical per-window results, fully parallel;
- sinks are keyed upsert tables (MongoSink analogue) behind
  ``foreachBatch`` -- the commit-log transactional backend by default,
  the plain parquet-directory store via ``transactional=False``; swap
  for the Mongo connector in production;
- counts are driven by an explicit ingest-time column, making the
  reference's processing-time behavior reproducible in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.sinks import KeyedUpsertSink, TransactionalKeyedUpsertSink
from ..streaming.stateful_join import stateful_user_address_join


class ReferencePipeline:
    """Assemble and run the reference's dataflow on any pair of streams.

    ``users`` / ``addresses`` are streaming DataFrames in USER_SCHEMA /
    ADDRESS_SCHEMA shape (plus optional ``seq``).  ``out_dir`` receives
    three upsert tables: userAddress/, userCountByState/,
    userCountByCountry/ -- the reference's three Mongo collections
    (Main.java:170-179).
    """

    def __init__(
        self,
        spark: SparkSession,
        users: DataFrame,
        addresses: DataFrame,
        out_dir: str,
        checkpoint_dir: str,
        window: str = "1 minute",
        seq_col: str | None = "seq",
        transactional: bool = True,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir
        self.window = window
        # The commit-log backend (cross-bucket crash atomicity,
        # multi-writer safe) is the default; transactional=False selects
        # the simpler parquet-directory store -- same upsert semantics,
        # single-writer durability only
        self.sink_cls = TransactionalKeyedUpsertSink if transactional else KeyedUpsertSink
        self.joined = stateful_user_address_join(users, addresses, seq_col=seq_col)
        self.queries = []
        self.sinks: dict[str, KeyedUpsertSink | TransactionalKeyedUpsertSink] = {}

    def start(self):
        """Start the three sink queries off the shared joined stream."""
        joined = self.joined.withColumn("ingest_time", F.current_timestamp())

        ua_sink = self.sink_cls(
            self.spark, os.path.join(self.out_dir, "userAddress"), key="userId", order_col="seq"
        )
        self.sinks["userAddress"] = ua_sink
        self.queries.append(
            joined.writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(self.checkpoint_dir, "ua"))
            .foreachBatch(ua_sink.foreach_batch())
            .start()
        )

        for dim, table in (("state", "userCountByState"), ("country", "userCountByCountry")):
            sink = self.sink_cls(self.spark, os.path.join(self.out_dir, table), key=dim)
            self.sinks[table] = sink
            exploded = joined.withColumn("addr", F.explode("addresses"))
            counted = (
                exploded.groupBy(
                    F.window("ingest_time", self.window).alias("win"),
                    F.col(f"addr.{dim}").alias(dim),
                )
                .agg(F.count(F.lit(1)).alias("count"))
                .select(dim, "count", F.col("win.start").alias("window_start"))
            )
            self.queries.append(
                counted.writeStream.outputMode("update")
                .option("checkpointLocation", os.path.join(self.checkpoint_dir, dim))
                .foreachBatch(sink.foreach_batch())
                .start()
            )
        return self.queries

    def process_all(self):
        for q in self.queries:
            q.processAllAvailable()

    def stop(self):
        for q in self.queries:
            q.stop()
