"""JSON wire decode -- Spark equivalent of the reference deserializers.

Reference: ``Deserializer/UserDeserializationSchema.java:16-24`` and
``Deserializer/AddressDeserializationSchema.java:16-24`` (Jackson byte[] ->
POJO, JavaTimeModule for the ISO-8601 timestamp).

Spark mapping: ``from_json`` with an explicit StructType.  Semantics
relative to Jackson: missing fields -> null (same); malformed record ->
null row (Jackson would throw; the null-row superset is deliberate --
SURVEY.md SS1.3).  Runs fully JVM-side inside whole-stage codegen; no UDF.

Works identically on batch and streaming DataFrames (the decode is a pure
projection, so Catalyst pushes surviving filters past it either way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import ADDRESS_SCHEMA, USER_SCHEMA, WIRE_TIMESTAMP_FORMAT


def _decoded(value_col: Column, schema, timestamp_format: str | None) -> Column:
    opts = {"timestampFormat": timestamp_format} if timestamp_format else {}
    return F.from_json(value_col.cast("string"), schema, opts)


def decode_user_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """``value`` (string/binary JSON) -> User columns.

    Keeps all other input columns (e.g. kafka key/topic/timestamp) out of
    the result: output is exactly the User schema, matching the
    value-only deserialization of the reference (Main.java:55 setValueOnlyDeserializer).
    """
    parsed = _decoded(F.col(value_col), USER_SCHEMA, WIRE_TIMESTAMP_FORMAT)
    return df.select(parsed.alias("r")).select("r.*")


def decode_address_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """``value`` (string/binary JSON) -> Address columns."""
    parsed = _decoded(F.col(value_col), ADDRESS_SCHEMA, None)
    return df.select(parsed.alias("r")).select("r.*")


def with_ingest_time(df: DataFrame, col_name: str = "ingest_time") -> DataFrame:
    """Attach a processing-time column at the source.

    The reference job is pure processing-time (``WatermarkStrategy
    .noWatermarks()`` -- Main.java:70-71); Spark's ``window()`` is
    event-time, so processing-time tumbling windows are expressed by
    windowing on this ingest-time column (SURVEY.md SS4 item 3).
    """
    return df.withColumn(col_name, F.current_timestamp())
