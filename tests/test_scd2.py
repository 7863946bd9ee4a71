"""SCD2 maintenance: chaining, no-op collapse, passthrough, new keys."""

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.operators.scd2 import scd2_apply

CUR_SCHEMA = "k long, seg string, valid_from timestamp, valid_to timestamp, is_current boolean"
CH_SCHEMA = "k long, seg string, change_ts timestamp"


def _ts(s):
    return datetime.fromisoformat(s)


def _apply(spark, cur, ch):
    out = scd2_apply(
        spark.createDataFrame(cur, CUR_SCHEMA),
        spark.createDataFrame(ch, CH_SCHEMA),
        key_cols=["k"],
        tracked_cols=["seg"],
    )
    return sorted(
        ((r.k, r.seg, r.valid_from, r.valid_to, r.is_current) for r in out.collect()),
    )


def test_change_chain_and_passthrough(spark):
    cur = [
        (1, "A", _ts("2020-01-01"), None, True),          # gets 2 changes
        (2, "B", _ts("2020-01-01"), None, True),          # untouched open
        (1, "Z", _ts("2019-01-01"), _ts("2020-01-01"), False),  # closed history
    ]
    ch = [
        (1, "C", _ts("2021-01-01")),
        (1, "D", _ts("2022-01-01")),
    ]
    got = _apply(spark, cur, ch)
    assert got == sorted(
        [
            (1, "Z", _ts("2019-01-01"), _ts("2020-01-01"), False),
            (1, "A", _ts("2020-01-01"), _ts("2021-01-01"), False),
            (1, "C", _ts("2021-01-01"), _ts("2022-01-01"), False),
            (1, "D", _ts("2022-01-01"), None, True),
            (2, "B", _ts("2020-01-01"), None, True),
        ]
    )


def test_noop_change_collapses(spark):
    cur = [(1, "A", _ts("2020-01-01"), None, True)]
    ch = [
        (1, "A", _ts("2021-01-01")),   # same attrs -> vanishes
        (1, "B", _ts("2022-01-01")),
    ]
    got = _apply(spark, cur, ch)
    assert got == sorted(
        [
            (1, "A", _ts("2020-01-01"), _ts("2022-01-01"), False),
            (1, "B", _ts("2022-01-01"), None, True),
        ]
    )


def test_new_key_opens_without_seed(spark):
    cur = [(1, "A", _ts("2020-01-01"), None, True)]
    ch = [(9, "N", _ts("2021-06-01"))]
    got = _apply(spark, cur, ch)
    assert (9, "N", _ts("2021-06-01"), None, True) in got
    assert (1, "A", _ts("2020-01-01"), None, True) in got


def test_idempotent_reapply_of_noop_batch(spark):
    # replaying a batch whose changes are already the current attrs
    # leaves the table bit-identical (the no-op collapse is what makes
    # foreachBatch retries safe)
    cur = [(1, "D", _ts("2022-01-01"), None, True)]
    ch = [(1, "D", _ts("2023-01-01"))]
    assert _apply(spark, cur, ch) == [(1, "D", _ts("2022-01-01"), None, True)]
