"""As-of (point-in-time) join: for each left row, the most recent right
row with right_ts <= left_ts on the same key.

Engine extension beyond the reference surface (SURVEY.md SS2.6 lists
as-of joins among the operators the reference lacks).  The classic use
is point-in-time feature lookup in training-data pipelines ("the user's
latest profile/event as of this example's timestamp") where a plain
equi-join would leak future data.

Implementation is the scalable union trick, not a range join: tag both
sides, union them, and take the running ``last`` of the right-side
payload over (key, ts, side) ordering.  One hash shuffle on the key +
one sort -- linear in rows at any scale, no per-key quadratic candidate
set, no broadcast requirement.  Right rows sort before left rows at
equal timestamps, giving the standard ``left_ts >= right_ts`` inclusive
semantics (same as DuckDB's ASOF JOIN, which the oracle uses).

Ties: two right rows with identical (key, ts) are resolved arbitrarily;
pre-aggregate the right side if that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_K, _T, _SIDE, _RV, _MATCH = "__asof_k", "__asof_t", "__asof_side", "__asof_rv", "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join each left row to the latest right row at-or-before its
    timestamp.  Right columns appear prefixed with ``right_prefix``.
    ``how='left'`` keeps unmatched left rows (prefixed cols null);
    ``how='inner'`` drops them."""
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner|left, got {how!r}")
    right_cols = right.columns
    helper = {_K, _T, _SIDE, _RV, _MATCH}
    clash = helper.intersection(left.columns)
    if clash:
        raise ValueError(f"asof_join: left columns collide with internal helper names: {sorted(clash)}")
    clash = helper.intersection({f"{right_prefix}{c}" for c in right_cols})
    if clash:
        raise ValueError(
            f"asof_join: prefixed right columns collide with internal helper "
            f"names: {sorted(clash)}; pass a different right_prefix"
        )
    clash = {f"{right_prefix}{c}" for c in right_cols}.intersection(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: prefixed right columns would silently overwrite "
            f"existing left columns {sorted(clash)}; pass a different right_prefix"
        )
    r = right.select(
        F.col(on).alias(_K),
        F.col(right_ts).alias(_T),
        F.struct(*[F.col(c) for c in right_cols]).alias(_RV),
        F.lit(0).alias(_SIDE),
    )
    l = left.select(
        "*",
        F.col(on).alias(_K),
        F.col(left_ts).alias(_T),
        F.lit(1).alias(_SIDE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(_K)
        .orderBy(F.col(_T).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(_MATCH, F.last(_RV, ignorenulls=True).over(w))
    out = filled.filter(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.filter(F.col(_MATCH).isNotNull())
    for c in right_cols:
        out = out.withColumn(f"{right_prefix}{c}", F.col(f"{_MATCH}.{c}"))
    return out.drop(_K, _T, _SIDE, _RV, _MATCH)
