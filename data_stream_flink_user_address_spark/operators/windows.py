"""Tumbling-window counts -- Spark analogue of reference Main.java:136-167.

Reference: two ``windowAll(TumblingProcessingTimeWindows.of(1 min))``
AllWindowFunctions counting addresses by state / by country into a
``Map<String,Integer>`` per window.  ``windowAll`` forces parallelism 1;
the Spark version groups by (window, dimension) which is semantically
identical per window but fully parallel (SURVEY.md SS2.4) -- this is the
shape that survives a 1000-executor scale-up.

The per-window Map<k,int> is represented relationally as one
(window_start, key, count) row per entry -- exactly what the reference's
sink converters flatten it into anyway
(``Converter/CountStateByUser.java:13-21``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_addresses(user_address: DataFrame) -> DataFrame:
    """Flatten UserAddress.addresses to one row per address occurrence.

    Mirrors the reference window functions' inner loop over
    ``element.getAddresses()`` (Main.java:141-145, 158-162).
    """
    return user_address.withColumn("addr", F.explode("addresses"))


def tumbling_window_count(
    df: DataFrame,
    time_col: str,
    dimension: str | Column,
    window_duration: str = "1 minute",
    count_alias: str = "count",
    *extra_aggs: Column,
) -> DataFrame:
    """(window, dimension) count over tumbling windows.

    Epoch-aligned, non-overlapping -- same alignment as Flink's
    TumblingProcessingTimeWindows.  Empty windows emit nothing (Flink
    fires only non-empty windows; Spark produces no row for empty
    groups -- SURVEY.md SS2.4 note b).  Works on batch and streaming
    inputs; streaming callers add a watermark first if they want
    append-mode finalized windows.

    ``extra_aggs``: additional aggregate columns computed in the SAME
    single hash aggregate (e.g. ``F.sum("value")``) -- piggybacking a
    sum on the count costs nothing at any scale, where a second
    windowed query would re-scan and re-shuffle the stream.
    """
    dim = F.col(dimension) if isinstance(dimension, str) else dimension
    return (
        df.groupBy(F.window(F.col(time_col), window_duration).alias("win"), dim)
        .agg(F.count(F.lit(1)).alias(count_alias), *extra_aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def watermarked_window_count(
    df: DataFrame,
    time_col: str,
    dimension: str | Column,
    window_duration: str = "1 minute",
    watermark_delay: str = "10 seconds",
    count_alias: str = "count",
) -> DataFrame:
    """Event-time tumbling count with a watermark -- the idiomatic upgrade
    path the reference never takes (it is pure processing-time,
    ``WatermarkStrategy.noWatermarks()`` -- Main.java:70-71).

    On a stream this supports append output mode: a window emits exactly
    once, when the watermark passes its end, and events later than
    ``watermark_delay`` are dropped -- bounded state, finalized results.
    """
    dim = F.col(dimension) if isinstance(dimension, str) else dimension
    return (
        df.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(F.col(time_col), window_duration).alias("win"), dim)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            dim,
            count_alias,
        )
    )


def sliding_window_count(
    df: DataFrame,
    time_col: str,
    dimension: str | Column,
    window_duration: str = "1 minute",
    slide_duration: str = "30 seconds",
    count_alias: str = "count",
) -> DataFrame:
    """Sliding (hopping) window count: each event lands in
    duration/slide overlapping windows.  Beyond the reference surface
    (SURVEY.md SS2.6); same fully-parallel (window x dim) shape."""
    dim = F.col(dimension) if isinstance(dimension, str) else dimension
    return (
        df.groupBy(
            F.window(F.col(time_col), window_duration, slide_duration).alias("win"), dim
        )
        .agg(F.count(F.lit(1)).alias(count_alias))
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def session_window_count(
    df: DataFrame,
    time_col: str,
    key: str | Column,
    gap: str = "5 minutes",
    count_alias: str = "count",
) -> DataFrame:
    """Gap-based session windows per key (``F.session_window``).  Beyond
    the reference surface; on streams combine with ``withWatermark`` for
    state cleanup."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(F.session_window(F.col(time_col), gap).alias("win"), k)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .withColumn("session_start", F.col("win.start"))
        .withColumn("session_end", F.col("win.end"))
        .drop("win")
    )


def count_by_dimension(
    user_address: DataFrame, dimension: str, count_alias: str = "count"
) -> DataFrame:
    """Global (non-windowed) address count by a dimension column.

    The batch analogue of W1/W2 when the whole input is one window:
    explode the address list, count by ``addr.state`` / ``addr.country``.
    """
    return (
        explode_addresses(user_address)
        .groupBy(F.col(f"addr.{dimension}").alias(dimension))
        .agg(F.count(F.lit(1)).alias(count_alias))
    )


def flatten_count_map(df: DataFrame, map_col: str, key_alias: str, count_alias: str = "count") -> DataFrame:
    """Map<k,int> -> one (k, count) row per entry.

    Reference W3 (``Converter/CountStateByUser.java:13-21``).  Only needed
    when an upstream chose MapType output; the engine's window counts are
    already relational.
    """
    return df.select(F.explode(F.col(map_col)).alias(key_alias, count_alias))
