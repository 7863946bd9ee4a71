"""Batch + streaming file readers with explicit schemas.

The reference pom declares file/CSV/JSON/JDBC connector surface with zero
call sites (``pom.xml:82-113`` -- SURVEY.md SS2.1 "declared-but-unused").
Spark covers all of these natively; these helpers standardize: explicit
StructType (never inference in production paths), column pruning via
``columns``, and an optional streaming mode that returns a
``readStream``-backed DataFrame with identical schema.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    streaming: bool = False,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Parquet scan. ``columns`` prunes at the scan (ReadSchema), which
    matters at 100 TB: never read columns the query does not touch."""
    if streaming:
        if schema is None:
            schema = spark.read.parquet(path).schema
        df = spark.readStream.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_orc(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    streaming: bool = False,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC scan -- same contract as :func:`read_parquet` (column pruning
    + predicate pushdown reach the ORC reader natively; Spark bundles
    ORC, unlike Avro whose external datasource module is absent in this
    container and is therefore not wrapped here)."""
    if streaming:
        if schema is None:
            schema = spark.read.orc(path).schema
        df = spark.readStream.schema(schema).orc(path)
    else:
        df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    timestamp_format: str | None = None,
    streaming: bool = False,
) -> DataFrame:
    """JSON lines with a mandatory explicit schema (SURVEY.md SS1.3)."""
    opts = {"timestampFormat": timestamp_format} if timestamp_format else {}
    reader = spark.readStream if streaming else spark.read
    return reader.options(**opts).schema(schema).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    streaming: bool = False,
) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    return reader.schema(schema).option("header", str(header).lower()).csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC read (reference DOC:4-10 declares a Postgres DDL, unused).

    At scale, always pass ``partition_column`` + bounds so the read fans
    out across executors instead of a single connection.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
