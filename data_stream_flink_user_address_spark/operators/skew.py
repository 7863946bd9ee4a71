"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most batch
skew automatically.  Salting is the explicit tool for the cases AQE
cannot touch: streaming stateful aggregations, deliberate two-phase
aggregations over heavy-hitter keys, and joins where one key dominates a
partition at 100 TB.

Both helpers are exact: results are identical to the unsalted
equivalent, only the shuffle distribution changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    count_alias: str = "count",
) -> DataFrame:
    """Two-phase count: partial agg by (keys + salt), final agg by keys.

    A single hot key's rows spread over ``n_salts`` reducers in phase 1;
    phase 2 merges ``n_salts`` partial rows per key -- tiny.  Spark's
    hash aggregate already does map-side partials, so reach for this only
    when a key is so hot that even the merge partition overloads
    (billions of rows on one key), or for stateful streaming aggs where
    per-key state itself must spread.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()), F.lit(n_salts))
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(*keys, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(count_alias))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    skewed_key: str | Column,
    small_key: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has heavy-hitter keys: the skewed side
    gets a per-row salt, the small side is replicated ``n_salts`` times
    (one row per salt), and the join runs on (key, salt) -- a hot key's
    rows land on ``n_salts`` different reducers instead of one.

    Replication costs ``n_salts x |small|`` rows, so the small side must
    actually be small (if it broadcasts, just broadcast -- no skew
    problem exists).  Result equals the plain join; salt columns never
    escape.

    Only left-side-preserving joins are exact: every salt partition holds
    a full replica of ``small``, so a skewed row sees the complete small
    side regardless of its salt (inner/left/semi/anti all hold).  Right
    and full outer joins would emit each UNMATCHED small-side row once
    per salt replica -- n_salts duplicates -- so they are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    # Spark normalizes join-type strings case-insensitively; mirror that
    # so spellings like 'Inner' or 'LEFT_SEMI' stay valid.
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-side-preserving joins only "
            f"({sorted(allowed)}), got {how!r}: right/full outer would "
            f"duplicate unmatched small-side rows n_salts times"
        )
    sk = F.col(skewed_key) if isinstance(skewed_key, str) else skewed_key
    sm = F.col(small_key) if isinstance(small_key, str) else small_key
    left = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(sk, F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    right = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    joined = left.join(right, (sk == sm) & (left[SALT_COL] == right[SALT_COL]), how)
    return joined.drop(SALT_COL)
