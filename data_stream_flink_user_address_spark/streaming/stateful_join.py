"""Stateful emit-per-event user/address join.

Exact Spark re-expression of the reference KeyedCoProcessFunction
(``Main.java:78-133``), semantics pinned by SURVEY.md SS2.3:

- user arrives  -> store/overwrite user; ALWAYS emit (user, addresses-so-far),
  empty list if none yet (Main.java:104-115).
- address arrives -> append (duplicates kept, list grows monotonically);
  emit (user, full-list) ONLY if the user already arrived
  (Main.java:118-132); otherwise buffer silently.
- state never expires by default (reference has no TTL) -- an optional
  processing-time timeout is exposed as the scale knob the reference lacks.

Architecture: the two input streams are unioned with a ``side``
discriminator and grouped by the user key, so each key's user and address
events meet in one Spark state partition -- the same co-partitioning the
reference gets from ``connect(...).keyBy(User::getId, Address::getUserId)``
(Main.java:78-80).  The per-key state machine runs in
``applyInPandasWithState`` (Arrow-batched; state = one user row + the
accumulated address list).

Scale: state is per-user-key and proportional to that user's address
count -- shuffling by key distributes it across all executors; no global
state, no driver participation.  At 100 TB the knobs are the state-store
backend (RocksDB) and the optional timeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import USER_ADDRESS_SCHEMA

# Unioned event schema: key + side discriminator + a sequence number for
# deterministic within-batch ordering + the union of both sides' fields.
UNION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("side", T.StringType(), False),  # 'U' | 'A'
        T.StructField("seq", T.LongType(), True),
        # user side
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("genre", T.StringType(), True),
        T.StructField("registerDate", T.TimestampType(), True),
        # address side
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("zipCode", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

# State: has_user flag + user scalar fields + parallel arrays for the
# accumulated addresses (applyInPandasWithState state rows are flat
# tuples; parallel arrays avoid nested-struct state encoding).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("has_user", T.BooleanType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("genre", T.StringType(), True),
        T.StructField("registerDate", T.TimestampType(), True),
        T.StructField("a_address", T.ArrayType(T.StringType()), True),
        T.StructField("a_city", T.ArrayType(T.StringType()), True),
        T.StructField("a_state", T.ArrayType(T.StringType()), True),
        T.StructField("a_zip", T.ArrayType(T.StringType()), True),
        T.StructField("a_country", T.ArrayType(T.StringType()), True),
    ]
)

# Output: USER_ADDRESS_SCHEMA + seq of the event that triggered the emission
# (lets tests assert the exact emission trace; harmless downstream).
OUTPUT_SCHEMA = T.StructType(USER_ADDRESS_SCHEMA.fields + [T.StructField("seq", T.LongType(), True)])


def union_with_discriminator(users: DataFrame, addresses: DataFrame, seq_col: str | None = "seq") -> DataFrame:
    """USER_SCHEMA + ADDRESS_SCHEMA frames -> one UNION_SCHEMA frame.

    ``seq_col`` names an existing ordering column on both inputs; pass
    None when arrival order within a micro-batch doesn't matter.
    """
    seq_u = F.col(seq_col) if seq_col and seq_col in users.columns else F.lit(None).cast("long")
    seq_a = F.col(seq_col) if seq_col and seq_col in addresses.columns else F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")
    u = users.select(
        F.col("id").alias("key"),
        F.lit("U").alias("side"),
        seq_u.alias("seq"),
        "name",
        "email",
        "genre",
        "registerDate",
        null_s.alias("address"),
        null_s.alias("city"),
        null_s.alias("state"),
        null_s.alias("zipCode"),
        null_s.alias("country"),
    )
    a = addresses.select(
        F.col("userId").alias("key"),
        F.lit("A").alias("side"),
        seq_a.alias("seq"),
        null_s.alias("name"),
        null_s.alias("email"),
        null_s.alias("genre"),
        F.lit(None).cast("timestamp").alias("registerDate"),
        "address",
        "city",
        "state",
        "zipCode",
        "country",
    )
    return u.unionByName(a)


class _KeyJoinState:
    """Per-key join state + the processElement1/2 logic of Main.java:104-132.

    Shared by the streaming operator (applyInPandasWithState) and the
    batch emission trace (mapInPandas over sorted runs) so both execute
    literally the same state machine.
    """

    __slots__ = ("key", "has_user", "name", "email", "genre", "register_date", "addrs")

    def __init__(self, key: str):
        self.key = key
        self.has_user = False
        self.name = self.email = self.genre = None
        self.register_date = None
        self.addrs: list[list] = [[], [], [], [], []]

    @classmethod
    def from_tuple(cls, key: str, t: tuple) -> "_KeyJoinState":
        s = cls(key)
        (s.has_user, s.name, s.email, s.genre, s.register_date, *arrays) = t
        s.addrs = [list(a or []) for a in arrays]
        return s

    def to_tuple(self) -> tuple:
        return (self.has_user, self.name, self.email, self.genre, self.register_date, *self.addrs)

    def _emission(self, seq) -> dict[str, Any]:
        return {
            "userId": self.key,
            "userName": self.name,
            "userEmail": self.email,
            "genre": self.genre,
            "registerDate": self.register_date,
            "addresses": [
                {"address": a, "city": c, "state": s, "zipCode": z, "country": co}
                for a, c, s, z, co in zip(*self.addrs)
            ],
            "seq": None if seq is None or pd.isna(seq) else int(seq),
        }

    def on_row(self, row) -> dict[str, Any] | None:
        """Process one event; return the emission (or None for a buffered
        address -- Main.java:128-131)."""
        if row.side == "U":
            # store/overwrite user, ALWAYS emit current snapshot
            self.has_user = True
            self.name, self.email, self.genre = row.name, row.email, row.genre
            self.register_date = None if pd.isna(row.registerDate) else row.registerDate
            return self._emission(row.seq)
        # append address (dupes kept); emit only if user present
        self.addrs[0].append(row.address)
        self.addrs[1].append(row.city)
        self.addrs[2].append(row.state)
        self.addrs[3].append(row.zipCode)
        self.addrs[4].append(row.country)
        return self._emission(row.seq) if self.has_user else None


def _join_state_machine(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState adapter around _KeyJoinState."""
    s = _KeyJoinState.from_tuple(key[0], state.get) if state.exists else _KeyJoinState(key[0])
    out_rows: list[dict[str, Any]] = []
    for pdf in pdf_iter:
        if "seq" in pdf.columns and pdf["seq"].notna().any():
            pdf = pdf.sort_values("seq", kind="stable")
        for row in pdf.itertuples(index=False):
            emission = s.on_row(row)
            if emission is not None:
                out_rows.append(emission)
    state.update(s.to_tuple())
    if out_rows:
        yield pd.DataFrame(out_rows)


def batch_emission_trace(users: DataFrame, addresses: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Run the SAME per-key state machine over a bounded input and return
    the full emission trace (one row per emission, ordered by ``seq``
    within each key).

    This is the batch-verifiable face of the stateful join: the driver's
    SQL oracle can reproduce the trace exactly (user emission with 0
    addresses, then the i-th address emission with i), while the operator
    shares ``_KeyJoinState`` with the streaming version.

    Execution shape: repartition by key + sort within partitions by
    (key, seq), then ONE ``mapInPandas`` pass per partition -- keys are
    contiguous in the sorted run, so state is a single live
    ``_KeyJoinState`` that resets at key boundaries.  One Python call per
    Arrow batch (not per key), which is what keeps this cheap at
    millions of keys.
    """
    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(users.sparkSession)
    unioned = union_with_discriminator(users, addresses, seq_col)
    arranged = unioned.repartition("key").sortWithinPartitions("key", "seq")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: _KeyJoinState | None = None  # carries across Arrow batches
        out: list[dict[str, Any]] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if state is None or row.key != state.key:
                    state = _KeyJoinState(row.key)
                emission = state.on_row(row)
                if emission is not None:
                    out.append(emission)
            if len(out) >= 50_000:
                yield pd.DataFrame(out)
                out = []
        if out:
            yield pd.DataFrame(out)

    return arranged.mapInPandas(run, schema=OUTPUT_SCHEMA)


def stateful_user_address_join(
    users: DataFrame,
    addresses: DataFrame,
    seq_col: str | None = "seq",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Streaming emit-per-event join; returns the emission stream.

    ``timeout=GroupStateTimeout.NoTimeout`` matches the reference's
    never-expiring state; pass ``ProcessingTimeTimeout`` and manage TTL in
    a custom fn for bounded state at scale.
    """
    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(users.sparkSession)
    unioned = union_with_discriminator(users, addresses, seq_col)
    return (
        unioned.groupBy("key")
        .applyInPandasWithState(
            _join_state_machine,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
