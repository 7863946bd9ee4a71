"""Distributed-correctness invariants.

Two families:
- Property-based (hypothesis): the vectorized batch emission trace must
  equal a trivially-correct pure-Python simulation of the reference
  state machine (Main.java:104-132) on random interleaved event
  sequences.
- Partitioning invariance: operator results must not depend on how the
  input happens to be partitioned (the property that makes an operator
  safe on a 1000-executor cluster).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_stream_flink_user_address_spark.operators.asof import asof_join
from data_stream_flink_user_address_spark.schemas import ADDRESS_SCHEMA, USER_SCHEMA
from data_stream_flink_user_address_spark.streaming.stateful_join import (
    batch_emission_trace,
)

USER_SEQ = T.StructType(USER_SCHEMA.fields + [T.StructField("seq", T.LongType())])
ADDR_SEQ = T.StructType(ADDRESS_SCHEMA.fields + [T.StructField("seq", T.LongType())])


def _simulate(events):
    """Pure-Python reference simulation: (key, side, seq) sorted by
    (key, seq) -> list of (key, seq, n_addresses) emissions."""
    out = []
    by_key: dict = {}
    for key, side, seq in sorted(events, key=lambda e: (e[0], e[2])):
        st_ = by_key.setdefault(key, {"user": False, "addrs": 0})
        if side == "U":
            st_["user"] = True
            out.append((key, seq, st_["addrs"]))
        else:
            st_["addrs"] += 1
            if st_["user"]:
                out.append((key, seq, st_["addrs"]))
    return sorted(out)


# events: up to 24 events over up to 4 keys, unique seq per event
@st.composite
def _event_seqs(draw):
    n = draw(st.integers(min_value=0, max_value=24))
    events = []
    for seq in range(n):
        key = f"k{draw(st.integers(min_value=0, max_value=3))}"
        side = draw(st.sampled_from(["U", "A"]))
        events.append((key, side, seq))
    return events


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_event_seqs())
def test_emission_trace_matches_reference_simulation(spark, events):
    users = [
        {"id": k, "name": "N", "email": "e", "genre": "F", "registerDate": None, "seq": s}
        for (k, side, s) in events
        if side == "U"
    ]
    addrs = [
        {"userId": k, "address": f"a{s}", "city": "c", "state": "s", "zipCode": "z",
         "country": "x", "seq": s}
        for (k, side, s) in events
        if side == "A"
    ]
    udf_ = spark.createDataFrame(users, USER_SEQ) if users else spark.createDataFrame([], USER_SEQ)
    adf_ = spark.createDataFrame(addrs, ADDR_SEQ) if addrs else spark.createDataFrame([], ADDR_SEQ)
    trace = batch_emission_trace(udf_, adf_)
    got = sorted(
        (r["userId"], r["seq"], len(r["addresses"])) for r in trace.collect()
    )
    assert got == _simulate(events)


def test_emission_trace_invariant_to_input_partitioning(spark):
    users = spark.createDataFrame(
        [{"id": f"k{i % 7}", "name": "N", "email": "e", "genre": "F",
          "registerDate": None, "seq": i} for i in range(0, 60, 3)],
        USER_SEQ,
    )
    addrs = spark.createDataFrame(
        [{"userId": f"k{i % 7}", "address": f"a{i}", "city": "c", "state": "s",
          "zipCode": "z", "country": "x", "seq": i} for i in range(1, 60, 2)],
        ADDR_SEQ,
    )

    def run(nu, na):
        t = batch_emission_trace(users.repartition(nu), addrs.repartition(na))
        return sorted((r["userId"], r["seq"], len(r["addresses"])) for r in t.collect())

    assert run(1, 1) == run(13, 5)


def test_asof_join_invariant_to_partitioning(spark):
    left = spark.range(200).select(
        (F.col("id") % 9).cast("string").alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000 + 500_000).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(150).select(
        (F.col("id") % 9).cast("string").alias("k"),
        F.timestamp_micros(F.col("id") * 1_300_000).alias("ts"),
        F.col("id").alias("rid"),
    )

    def run(nl, nr):
        j = asof_join(left.repartition(nl), right.repartition(nr), on="k")
        return sorted((r["lid"], r["r_rid"]) for r in j.collect())

    assert run(1, 1) == run(17, 3)


@st.composite
def _asof_inputs(draw):
    n_keys = draw(st.integers(min_value=1, max_value=3))
    left = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 50)),
            min_size=1, max_size=15, unique=True,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 50)),
            min_size=0, max_size=15, unique=True,
        )
    )
    return left, right


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_asof_inputs())
def test_asof_join_matches_python_reference(spark, inputs):
    left_rows, right_rows = inputs
    left = spark.createDataFrame(
        [(f"k{k}", t, i) for i, (k, t) in enumerate(left_rows)], "k string, t long, lid long"
    ).select("k", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"), "lid")
    right = spark.createDataFrame(
        [(f"k{k}", t, i) for i, (k, t) in enumerate(right_rows)] or [],
        "k string, t long, rid long",
    ).select("k", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"), "rid")

    got = sorted(
        (r["lid"], r["r_rid"]) for r in asof_join(left, right, on="k").collect()
    )
    expected = []
    for i, (lk, lt) in enumerate(left_rows):
        candidates = [
            (rt, j) for j, (rk, rt) in enumerate(right_rows) if rk == lk and rt <= lt
        ]
        if candidates:
            # latest at-or-before; ties impossible (unique (k, t) pairs)
            expected.append((i, max(candidates)[1]))
    assert got == sorted(expected)
