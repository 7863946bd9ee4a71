"""SCD2 (slowly-changing-dimension, type 2) maintenance as one
declarative batch plan.

Engine extension beyond the reference surface (the reference's sinks
overwrite in place, ``Main.java:154-165``; SCD2 is the standard
warehouse answer when history must survive).  Given the CURRENT
dimension table (closed rows carry ``[valid_from, valid_to)``; open
rows have NULL ``valid_to``) and a batch of CHANGES, produce the new
dimension:

- closed history passes through untouched,
- open rows of keys WITHOUT changes pass through untouched,
- for each changed key, the open row seeds a per-key lineage with the
  change rows, ordered by ``(ts, seed-first)``; consecutive versions
  with identical tracked attributes collapse (no-op changes vanish);
  each surviving version's ``valid_to`` is the next version's start,
  and the last is the new open row.

Scale shape: the expensive work is proportional to the CHANGED keys,
not the dimension -- unchanged open rows leave via a left-anti join on
the (small, broadcastable) changed-key set, and the only wide operation
is one key-partitioned window over ``open rows of changed keys +
change rows``.  Closed history is never shuffled at all.  Determinism:
caller guarantees ``(key, ts)`` unique within a batch; on a ts tie the
seed row sorts first.

Streaming: apply per micro-batch via ``foreachBatch`` against the
transactional keyed sink, exactly like the reference-sink upserts
(``streaming/sinks.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """New SCD2 state of ``current`` after applying ``changes``.

    Precondition: every change row's ``ts_col`` must be >= the open
    row's ``valid_from`` for that key (and (key, ts) pairs unique).  A
    change timestamped BEFORE the open row's ``valid_from`` is
    out-of-order history: the lineage window would order it ahead of
    the seed, making the pre-existing attributes the "latest" version
    and potentially overlapping closed history.  Late-arriving history
    rewrites need a full-history rebuild (seed from ALL versions, not
    just the open row), which is a different, corpus-wide operation --
    this operator is the incremental path and assumes in-order feeds.
    """
    key_cols = list(key_cols)
    tracked_cols = list(tracked_cols)
    out_cols = key_cols + tracked_cols + [valid_from, valid_to, current_flag]

    closed = current.filter(F.col(valid_to).isNotNull()).select(*out_cols)
    open_rows = current.filter(F.col(valid_to).isNull())
    ch_keys = changes.select(*key_cols).distinct()
    untouched_open = open_rows.join(ch_keys, key_cols, "left_anti").select(*out_cols)

    seed = (
        open_rows.join(ch_keys, key_cols, "left_semi")
        .select(
            *key_cols,
            *tracked_cols,
            F.col(valid_from).alias("__ts"),
            F.lit(0).alias("__seq"),
        )
    )
    ch = changes.select(
        *key_cols, *tracked_cols, F.col(ts_col).alias("__ts"), F.lit(1).alias("__seq")
    )
    lineage = seed.unionByName(ch)

    w = Window.partitionBy(*key_cols).orderBy(F.col("__ts").asc(), F.col("__seq").asc())
    attrs = F.struct(*[F.col(c) for c in tracked_cols])
    # drop no-op versions (identical tracked attrs as the previous one),
    # then close each survivor at the NEXT survivor's start -- the lead
    # must run after the filter so collapsed versions don't leave holes
    lin = lineage.withColumn("__prev", F.lag(attrs).over(w)).filter(
        F.col("__prev").isNull() | (F.col("__prev") != attrs)
    )
    rebuilt = (
        lin.withColumn("__next_ts", F.lead("__ts").over(w))
        .select(
            *key_cols,
            *tracked_cols,
            F.col("__ts").alias(valid_from),
            F.col("__next_ts").alias(valid_to),
            F.col("__next_ts").isNull().alias(current_flag),
        )
    )
    return closed.unionByName(untouched_open).unionByName(rebuilt)
