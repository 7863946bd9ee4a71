"""Interval (time-range) join: pair left/right rows whose timestamps are
within [lower_s, upper_s] seconds of each other.

Engine extension beyond the reference surface (SURVEY.md SS2.6 lists
interval joins among the operators the reference lacks).  Typical use:
attribute conversions to preceding impressions, correlate log lines
across services.

Two execution shapes:

- **Keyed** (``on`` given): plain equi-join on the key with the time
  range as a residual filter -- Catalyst plans a hash/sort-merge join on
  the key; the range never multiplies the candidate set beyond the key's
  own rows.  This is the 100 TB path whenever a key exists.
- **Un-keyed** (``on=None``): time-bucket join.  Each right row lands in
  one bucket of width >= the interval span; each left row probes its two
  covering buckets (exploded), then the exact range filter applies.
  Data movement is 2x left + 1x right -- linear, never the cross
  product a naive theta-join would trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__iv_bucket"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    on: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Rows (l, r) with ``l.ts + lower_s <= r.ts <= l.ts + upper_s``
    (and equal ``on`` key when given).  Right columns are prefixed."""
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    prefixed = {f"{right_prefix}{c}" for c in right.columns}
    clash = prefixed.intersection(left.columns)
    clash.update({_B}.intersection(left.columns))
    clash.update({_B}.intersection(prefixed))
    if clash:
        raise ValueError(
            f"interval_join: prefixed right columns / helper names collide "
            f"with left columns {sorted(clash)}; pass a different right_prefix"
        )
    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    r_ts = f"{right_prefix}{right_ts}"
    lo = F.col(left_ts) + F.make_interval(secs=F.lit(float(lower_s)))
    hi = F.col(left_ts) + F.make_interval(secs=F.lit(float(upper_s)))
    in_range = (F.col(r_ts) >= lo) & (F.col(r_ts) <= hi)

    if on is not None:
        return left.join(r, (F.col(on) == F.col(f"{right_prefix}{on}")) & in_range).drop(
            f"{right_prefix}{on}"
        )

    # un-keyed: bucket width covers the whole interval span, so a right
    # row matching a left row is in the left row's bucket or the next one
    w = max(upper_s - lower_s, 1.0)
    r_bucket = F.floor((F.unix_micros(F.col(r_ts)) / 1e6 - lower_s) / w).cast("long")
    l_bucket0 = F.floor(F.unix_micros(F.col(left_ts)) / 1e6 / w).cast("long")
    lb = left.withColumn(_B, F.explode(F.array(l_bucket0, l_bucket0 + 1)))
    rb = r.withColumn(_B, r_bucket)
    return lb.join(rb, _B).filter(in_range).drop(_B)
