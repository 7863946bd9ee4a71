"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Table mapping onto the engine's domain model (FIXTURES.md SS6): ``customer``
plays user, ``orders``/``lineitem`` play address (N rows per key) for
join/explode/count shapes, ``events`` plays the Kafka stream for windowed
counts, ``documents``/``embeddings`` back the LLM-pipeline operators.

Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL.  Doubles are rounded in BOTH so the
value-hash is stable across engines.  Timestamps are emitted as formatted
strings for the same reason.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.operators.join import user_address_snapshot
from data_stream_flink_user_address_spark.operators.windows import tumbling_window_count
from data_stream_flink_user_address_spark.sources.tables import load_table as _t_load

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _t_load(spark, sf_dir, name)


def _utc(spark: SparkSession) -> None:
    """Pin session TZ for timestamp->string rendering.

    The driver owns the SparkSession and may not run UTC; DuckDB
    timestamps are UTC-naive, so every query that formats a timestamp
    pins the session timezone first (runtime-settable conf).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _customer_as_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> USER_SCHEMA-shaped frame (FIXTURES.md SS6 mapping)."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id"),
        F.col("c_name").alias("name"),
        F.concat(F.col("c_name"), F.lit("@example.com")).alias("email"),
        F.col("c_mktsegment").alias("genre"),
        F.lit(None).cast("timestamp").alias("registerDate"),
    )


def _orders_as_addresses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ADDRESS_SCHEMA-shaped frame: o_orderpriority plays state,
    o_orderstatus plays country (N rows per customer key)."""
    return _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("userId"),
        F.col("o_orderkey").cast("string").alias("address"),
        F.lit(None).cast("string").alias("city"),
        F.col("o_orderpriority").alias("state"),
        F.col("o_totalprice").cast("string").alias("zipCode"),
        F.col("o_orderstatus").alias("country"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's centerpiece join -- final-snapshot
    UserAddress (left join + collect_list struct) on sf0.001."""
    users = _customer_as_users(spark, SF0001)
    addresses = _orders_as_addresses(spark, SF0001)
    return user_address_snapshot(users, addresses)


# --------------------------------------------------------------------------
# queries(): each callable is (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def _q_user_address_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-snapshot join, scalar projection: address count per user
    (reference Dto/UserAddress.java shape; array sizes instead of the
    nested array so the oracle hash is representation-independent)."""
    snap = user_address_snapshot(
        _customer_as_users(spark, sf_dir), _orders_as_addresses(spark, sf_dir)
    )
    return snap.select(
        F.col("userId").cast("bigint").alias("user_key"),
        F.col("userName").alias("user_name"),
        F.size("addresses").cast("bigint").alias("n_addresses"),
    )


def _q_count_by_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 analog: count address occurrences by state dimension
    (o_orderpriority) over the joined/exploded stream (Main.java:136-150)."""
    snap = user_address_snapshot(
        _customer_as_users(spark, sf_dir), _orders_as_addresses(spark, sf_dir)
    )
    exploded = snap.select(F.explode("addresses").alias("addr"))
    return exploded.groupBy(F.col("addr.state").alias("state")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _q_count_by_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 analog: count by country dimension (o_orderstatus)."""
    snap = user_address_snapshot(
        _customer_as_users(spark, sf_dir), _orders_as_addresses(spark, sf_dir)
    )
    exploded = snap.select(F.explode("addresses").alias("addr"))
    return exploded.groupBy(F.col("addr.country").alias("country")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _q_windowed_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-minute window count by event_type on the stream table
    (reference 1-min TumblingProcessingTimeWindows, Main.java:137,154)."""
    _utc(spark)
    events = _t(spark, sf_dir, "events")
    counted = tumbling_window_count(events, "ts", "event_type", "1 minute", "cnt")
    return counted.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "cnt",
    )


def _q_windowed_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window sum(value) by event_type."""
    _utc(spark)
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total_value"), F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "total_value",
            "cnt",
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "user_address_counts": _q_user_address_counts,
    "count_by_state": _q_count_by_state,
    "count_by_country": _q_count_by_country,
    "windowed_count_by_type": _q_windowed_count_by_type,
    "windowed_value_sum": _q_windowed_value_sum,
}

ORACLE_SQL: dict[str, str] = {
    "user_address_counts": """
        SELECT c.c_custkey AS user_key,
               c.c_name    AS user_name,
               count(o.o_orderkey) AS n_addresses
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    "count_by_state": """
        SELECT o.o_orderpriority AS state, count(*) AS cnt
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_orderpriority
    """,
    "count_by_country": """
        SELECT o.o_orderstatus AS country, count(*) AS cnt
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_orderstatus
    """,
    "windowed_count_by_type": """
        SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
    """,
    "windowed_value_sum": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               round(sum(value), 2) AS total_value,
               count(*) AS cnt
        FROM events GROUP BY 1, 2
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md SS2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    return dict(ORACLE_SQL)
