"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

``events.parquet`` has shipped with ``ts`` as either nanosecond int64
(which Spark's parquet reader rejects by default, PARQUET_TYPE_ILLEGAL)
or native ``timestamp[us]``, depending on driver round.  The loader
flips the legacy nanosAsLong read conf (runtime-settable) and, when the
column arrives as a long, converts ns -> the engine's microsecond
TimestampType -- the same floor-to-microsecond DuckDB applies when
reading ns parquet, so oracles agree.  A native timestamp passes
through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one driver table.

    ``spread=True`` round-robins the scan output across
    ``defaultParallelism`` partitions.  Use it for compute-heavy
    derivations (shingling, hashing, vector math) over SMALL single-file
    inputs: a 1-2 MB parquet arrives as ONE input split, so without the
    respread the whole downstream pipeline runs on one core.  The shuffle
    moves only the tiny source bytes.  On a real multi-file / 100 TB
    table the scan already yields thousands of splits -- leave spread
    off and let file splitting drive parallelism.
    """
    if name == "events":
        df = load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Register every driver table as a temp view (``region``,
    ``nation``, ... [+ suffix]) so the full surface is queryable through
    plain ``spark.sql`` -- the SQL front door the reference only ever
    declared dependencies for (flink-table-planner in pom.xml, zero call
    sites)."""
    names = []
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")
        names.append(f"{name}{suffix}")
    return names


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the driver has shipped ts as BOTH nanosecond int64 (read as long
    # under nanosAsLong) and native timestamp[us] (read as
    # TIMESTAMP_NTZ); accept either.  The NTZ -> TIMESTAMP cast
    # reinterprets the wall-clock fields in the session zone -- UTC here
    # (session.py) -- so it is value-preserving and agrees with DuckDB's
    # naive-timestamp read of the same file.
    if not isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    # legacy ns-as-long: integer FLOOR division: /1000 via double loses
    # 1-us precision at epoch-nanosecond magnitudes (2^52 < 1.7e18), and
    # `div` truncates toward zero, which would round pre-1970 (negative
    # ns) timestamps UP where DuckDB floors; subtracting pmod first
    # makes div exact
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
    )
