"""Native watermarked stream-stream join.

The reference's CoProcess join (Main.java:78-133) buffers both sides
forever.  Spark's built-in stream-stream join is the bounded-state
alternative: both sides carry watermarks and the join condition carries
a time range, so each side's buffer is dropped once the watermark passes
the range -- state is O(window), not O(stream).  SURVEY.md SS2.3 notes
this approximates (not reproduces) the reference's emit-per-event
semantics; use :mod:`.stateful_join` for exact parity and this operator
when bounded state matters more than the exact emission trace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark_delay: str = "10 seconds",
    within: str = "1 hour",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join events on a key where the right event falls within
    ``[left_ts, left_ts + within]``; both sides watermarked so the
    engine can discard buffered rows.  Right columns are prefixed.

    ``how`` supports ``inner`` and ``leftOuter`` (outer emission waits
    for the watermark to close the window, per Spark semantics).
    """
    clash = {f"{right_prefix}{c}" for c in right.columns}.intersection(left.columns)
    if clash:
        raise ValueError(
            f"watermarked_stream_join: prefixed right columns collide with "
            f"left columns {sorted(clash)}; pass a different right_prefix"
        )
    r = right.select(*[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    l_wm = left.withWatermark(left_ts, watermark_delay)
    r_wm = r.withWatermark(f"{right_prefix}{right_ts}", watermark_delay)
    r_ts_col = F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(on) == F.col(f"{right_prefix}{on}"))
        & (r_ts_col >= F.col(left_ts))
        & (r_ts_col <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l_wm.join(r_wm, cond, how).drop(f"{right_prefix}{on}")
