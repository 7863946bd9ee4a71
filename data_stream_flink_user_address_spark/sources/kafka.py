"""Kafka JSON source -- Spark equivalent of reference Main.java:51-67.

Reference config: bootstrap ``localhost:9092``, topics ``user`` /
``address``, **earliest** offsets, 1 s partition discovery, value-only
JSON deserialization (``Main.java:51-67``).  Spark's Kafka source handles
partition discovery automatically; offsets map to ``startingOffsets``.

The kafka-sql connector jar is not bundled in every environment, so the
builder is import-safe: constructing the plan raises a clear error only
when the package is genuinely unavailable at ``load()`` time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .json_decode import decode_address_json, decode_user_json, with_ingest_time


def kafka_json_stream(
    spark: SparkSession,
    topic: str,
    schema: T.StructType,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    decode: str | None = None,
) -> DataFrame:
    """``readStream.format("kafka")`` -> decoded columns + ingest_time.

    ``decode`` selects the wire decoder: "user" | "address" | None
    (None = generic from_json with ``schema``).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    if decode == "user":
        parsed = decode_user_json(raw)
    elif decode == "address":
        parsed = decode_address_json(raw)
    else:
        from pyspark.sql import functions as F

        parsed = raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("r")
        ).select("r.*")
    return with_ingest_time(parsed)
