"""Emission-trace tests for the stateful user/address join.

FIXTURES.md SS5 pins the exact per-event emissions of the reference
KeyedCoProcessFunction (Main.java:104-132).  These drive the real
streaming operator (file source -> applyInPandasWithState -> memory sink)
and assert the trace, including multi-batch state persistence.
"""

import json
import os
import sys
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from data_stream_flink_user_address_spark.schemas import ADDRESS_SCHEMA, USER_SCHEMA
from data_stream_flink_user_address_spark.streaming.stateful_join import (
    stateful_user_address_join,
)

USER_SEQ_SCHEMA = T.StructType(USER_SCHEMA.fields + [T.StructField("seq", T.LongType())])
ADDR_SEQ_SCHEMA = T.StructType(ADDRESS_SCHEMA.fields + [T.StructField("seq", T.LongType())])


def _user(key, seq, name="N"):
    return {"id": key, "name": name, "email": f"{name}@x.com", "genre": "F",
            "registerDate": None, "seq": seq}


def _addr(key, seq, state="S1", country="C1"):
    return {"userId": key, "address": f"a{seq}", "city": "c", "state": state,
            "zipCode": "z", "country": country, "seq": seq}


class JoinHarness:
    """File-source streaming harness: append events, process, read emissions."""

    def __init__(self, spark, tmpdir):
        self.spark = spark
        self.udir = os.path.join(tmpdir, "users")
        self.adir = os.path.join(tmpdir, "addresses")
        os.makedirs(self.udir)
        os.makedirs(self.adir)
        self.qname = "join_out_" + uuid.uuid4().hex[:8]
        users = spark.readStream.schema(USER_SEQ_SCHEMA).json(self.udir)
        addresses = spark.readStream.schema(ADDR_SEQ_SCHEMA).json(self.adir)
        out = stateful_user_address_join(users, addresses)
        self.query = (
            out.writeStream.format("memory")
            .queryName(self.qname)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
            .start()
        )

    def feed(self, users=(), addresses=()):
        for rows, d in ((users, self.udir), (addresses, self.adir)):
            if rows:
                fn = os.path.join(d, f"{uuid.uuid4().hex}.json")
                with open(fn, "w") as f:
                    for r in rows:
                        f.write(json.dumps(r) + "\n")
        self.query.processAllAvailable()

    def emissions(self, key=None):
        df = self.spark.sql(f"SELECT * FROM {self.qname}")
        rows = [r.asDict(recursive=True) for r in df.collect()]
        if key is not None:
            rows = [r for r in rows if r["userId"] == key]
        return sorted(rows, key=lambda r: (r["seq"] is None, r["seq"]))

    def stop(self):
        self.query.stop()


@pytest.fixture
def harness(spark, tmp_path):
    h = JoinHarness(spark, str(tmp_path))
    yield h
    h.stop()


def _addr_lists(emissions):
    return [[a["address"] for a in e["addresses"]] for e in emissions]


def test_all_traces_single_batch(harness):
    # Five FIXTURES.md SS5 traces, distinct keys, one micro-batch.
    harness.feed(
        users=[_user("uf", 1), _user("af", 13), _user("uu", 20, "V1"),
               _user("uu", 22, "V2"), _user("da", 30)],
        addresses=[
            _addr("uf", 2), _addr("uf", 3), _addr("uf", 4),          # user-first
            _addr("af", 11), _addr("af", 12),                         # address-first
            _addr("uu", 21),                                          # user-update
            _addr("da", 31), _addr("da", 31),                         # duplicate-address
            _addr("orphan", 40),                                      # orphan-address
        ],
    )
    # user-first: U,A1,A2,A3 -> 4 growing snapshots
    e = harness.emissions("uf")
    assert _addr_lists(e) == [[], ["a2"], ["a2", "a3"], ["a2", "a3", "a4"]]
    # address-first: A1,A2,U -> single emission with both addresses
    e = harness.emissions("af")
    assert _addr_lists(e) == [["a11", "a12"]]
    # user-update: U,A1,U' -> ([],[a21],[a21]) and the update overwrites name
    e = harness.emissions("uu")
    assert _addr_lists(e) == [[], ["a21"], ["a21"]]
    assert [x["userName"] for x in e] == ["V1", "V1", "V2"]
    # duplicate-address kept (Main.java:124)
    e = harness.emissions("da")
    assert _addr_lists(e) == [[], ["a31"], ["a31", "a31"]]
    # orphan address: no emission
    assert harness.emissions("orphan") == []


def test_state_persists_across_batches(harness):
    # batch 1: orphan address buffered silently
    harness.feed(addresses=[_addr("k1", 1)])
    assert harness.emissions("k1") == []
    # batch 2: user arrives -> emits with the buffered address
    harness.feed(users=[_user("k1", 2)])
    assert _addr_lists(harness.emissions("k1")) == [["a1"]]
    # batch 3: another address appends to persisted list
    harness.feed(addresses=[_addr("k1", 3)])
    assert _addr_lists(harness.emissions("k1")) == [["a1"], ["a1", "a3"]]


def test_state_recovers_from_checkpoint_restart(spark, tmp_path):
    """Stop the streaming query and start a NEW one on the same
    checkpoint: per-key join state must survive the restart (the
    fault-tolerance property the reference lacks entirely -- it never
    enables checkpointing, SURVEY.md SS4)."""
    tmpdir = str(tmp_path)
    udir, adir = os.path.join(tmpdir, "users"), os.path.join(tmpdir, "addresses")
    os.makedirs(udir)
    os.makedirs(adir)
    ckpt = os.path.join(tmpdir, "ckpt")
    outdir = os.path.join(tmpdir, "out")

    def start():
        # file sink (not memory): the memory sink refuses checkpoint
        # recovery; parquet append is the fault-tolerant shape
        users = spark.readStream.schema(USER_SEQ_SCHEMA).json(udir)
        addresses = spark.readStream.schema(ADDR_SEQ_SCHEMA).json(adir)
        out = stateful_user_address_join(users, addresses)
        return (
            out.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    def feed(d, rows, q):
        with open(os.path.join(d, f"{uuid.uuid4().hex}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        q.processAllAvailable()

    q1 = start()
    try:
        feed(udir, [_user("r1", 1)], q1)
        feed(adir, [_addr("r1", 2)], q1)
    finally:
        q1.stop()

    q2 = start()
    try:
        # address arriving AFTER restart must append to the recovered
        # list, proving user + prior address survived in the state store
        feed(adir, [_addr("r1", 3)], q2)
    finally:
        q2.stop()
    rows = [r.asDict(recursive=True) for r in spark.read.parquet(outdir).collect()]
    emits = [r for r in rows if r["userId"] == "r1" and r["seq"] == 3]
    assert len(emits) == 1
    assert [a["address"] for a in emits[0]["addresses"]] == ["a2", "a3"]
    assert emits[0]["userName"] == "N"


class _FakeGroupState:
    """Minimal GroupState double for driving the state machine directly.

    A live-stream TTL test is not deterministic: with a processing-time
    timeout armed, ``processAllAvailable`` never quiesces (the engine
    keeps scheduling timeout-check batches), so the timeout path is
    pinned here at the adapter level instead.
    """

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self.removed = True
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _machine_rows(rows):
    import pandas as pd

    cols = ["key", "side", "seq", "name", "email", "genre", "registerDate",
            "address", "city", "state", "zipCode", "country"]
    return iter([pd.DataFrame([{c: r.get(c) for c in cols} for r in rows])])


def test_ttl_machine_arms_timeout_and_drops_state():
    from data_stream_flink_user_address_spark.streaming.stateful_join import (
        _make_join_state_machine,
    )

    machine = _make_join_state_machine(500)
    # user event: emission produced, state stored, TTL armed
    st = _FakeGroupState()
    out = list(machine(("k1",), _machine_rows([
        {"key": "k1", "side": "U", "seq": 1, "name": "N", "email": "e", "genre": "F"},
    ]), st))
    assert len(out) == 1 and st.exists and st.timeout_set == 500
    # timeout fires: state dropped, nothing emitted
    st.hasTimedOut = True
    out = list(machine(("k1",), iter([]), st))
    assert out == [] and st.removed and not st.exists
    # address after expiry: fresh state -> buffered silently (no user)
    st2 = _FakeGroupState()
    out = list(machine(("k1",), _machine_rows([
        {"key": "k1", "side": "A", "seq": 2, "address": "a", "city": "c",
         "state": "s", "zipCode": "z", "country": "x"},
    ]), st2))
    assert out == [] and st2.exists and st2.timeout_set == 500


def test_no_ttl_machine_never_arms_timeout():
    from data_stream_flink_user_address_spark.streaming.stateful_join import (
        _make_join_state_machine,
    )

    machine = _make_join_state_machine(None)
    st = _FakeGroupState()
    out = list(machine(("k1",), _machine_rows([
        {"key": "k1", "side": "U", "seq": 1, "name": "N", "email": "e", "genre": "F"},
    ]), st))
    assert len(out) == 1 and st.timeout_set is None


def test_address_struct_fields(harness):
    harness.feed(users=[_user("k2", 1)], addresses=[_addr("k2", 2, state="Illinois", country="Brazil")])
    e = harness.emissions("k2")
    assert e[-1]["addresses"][0] == {
        "address": "a2", "city": "c", "state": "Illinois", "zipCode": "z", "country": "Brazil",
    }


class _FakeValueState:
    """transformWithState ValueState double (get/exists/update surface)."""

    def __init__(self):
        self._v = None
        self.updates = []

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.updates.append(v)


class _FakeListState:
    """transformWithState ListState double.

    Records every ``appendList`` call separately so tests can assert the
    incremental-write property (each call carries only the delta).
    """

    def __init__(self):
        self._items = []
        self.append_calls = []

    def exists(self):
        return len(self._items) > 0

    def get(self):
        return iter(list(self._items))

    def appendList(self, items):
        items = list(items)
        self._items.extend(items)
        self.append_calls.append(items)


class _FakeHandle:
    """StatefulProcessorHandle double: hands out the fakes above."""

    def __init__(self):
        self.value_states = {}
        self.list_states = {}

    def getValueState(self, name, schema, ttl=None):
        return self.value_states.setdefault(name, _FakeValueState())

    def getListState(self, name, schema, ttl=None):
        return self.list_states.setdefault(name, _FakeListState())


def _drive_v2(key, batches):
    """Run UserAddressProcessorV2 over scripted batches with fake state.

    ``batches`` is a list of row-dict lists (one list per micro-batch for
    this key).  Returns (emissions, handle) — emissions as plain dicts.
    """
    from data_stream_flink_user_address_spark.streaming.stateful_join import (
        UserAddressProcessorV2,
    )

    proc = UserAddressProcessorV2()
    handle = _FakeHandle()
    proc.init(handle)
    out = []
    for rows in batches:
        for pdf in proc.handleInputRows((key,), _machine_rows(rows), None):
            out.extend(pdf.to_dict("records"))
    return out, handle


def _drive_v1(key, batches):
    """Run the v1 _KeyJoinState machine over the same scripted batches."""
    from data_stream_flink_user_address_spark.streaming.stateful_join import (
        _KeyJoinState,
    )

    s = _KeyJoinState(key)
    out = []
    for rows in batches:
        pdf = next(_machine_rows(rows))
        for row in pdf.itertuples(index=False):
            e = s.on_row(row)
            if e is not None:
                out.append(e)
    return out


def _u_row(key, seq, name="N"):
    return {"key": key, "side": "U", "seq": seq, "name": name,
            "email": f"{name}@x.com", "genre": "F"}


def _a_row(key, seq, addr=None):
    return {"key": key, "side": "A", "seq": seq, "address": addr or f"a{seq}",
            "city": "c", "state": "S1", "zipCode": "z", "country": "C1"}


# The five FIXTURES.md SS5 traces, as (name, batches) — same scripts the
# live-stream tests above feed through the v1 operator.
_V2_TRACES = [
    ("user_first", [[_u_row("k", 1), _a_row("k", 2), _a_row("k", 3), _a_row("k", 4)]]),
    ("address_first", [[_a_row("k", 1), _a_row("k", 2), _u_row("k", 3)]]),
    ("user_update", [[_u_row("k", 1, "V1"), _a_row("k", 2), _u_row("k", 3, "V2")]]),
    ("duplicate_address", [[_u_row("k", 1), _a_row("k", 2, "dup"), _a_row("k", 3, "dup")]]),
    ("orphan_address", [[_a_row("k", 1)]]),
    # cross-batch persistence: buffered orphan released by a later user,
    # then an append in a third batch
    ("cross_batch", [[_a_row("k", 1)], [_u_row("k", 2)], [_a_row("k", 3)]]),
]


@pytest.mark.parametrize("name,batches", _V2_TRACES, ids=[t[0] for t in _V2_TRACES])
def test_v2_fake_handle_emissions_equal_v1(name, batches):
    """UserAddressProcessorV2's state machine (driven with fake
    Value/List state handles — no protobuf, no state server) must emit
    EXACTLY what the v1 _KeyJoinState machine emits for every scripted
    trace, field for field."""
    v2_out, _ = _drive_v2("k", batches)
    v1_out = _drive_v1("k", batches)
    assert v2_out == v1_out
    # spot-check the one trace with a known expected shape
    if name == "user_first":
        assert [[a["address"] for a in e["addresses"]] for e in v2_out] == [
            [], ["a2"], ["a2", "a3"], ["a2", "a3", "a4"],
        ]


def test_v2_append_list_writes_only_the_delta():
    """The scale-critical property of the v2 state shape: an address
    event appends ONE ListState entry (RocksDB incremental put) instead
    of rewriting the whole accumulated array like v1.  Assert each
    appendList call carries exactly that batch's new addresses."""
    batches = [
        [_u_row("k", 1), _a_row("k", 2), _a_row("k", 3)],  # batch 1: 2 addrs
        [_a_row("k", 4)],                                   # batch 2: 1 addr
        [_u_row("k", 5, "V2")],                             # batch 3: none
    ]
    out, handle = _drive_v2("k", batches)
    ls = handle.list_states["addresses"]
    # one appendList per batch that had addresses, each only the delta
    assert [len(c) for c in ls.append_calls] == [2, 1]
    assert [e[0] for c in ls.append_calls for e in c] == ["a2", "a3", "a4"]
    # and the accumulated list state equals the full address run
    assert [e[0] for e in ls._items] == ["a2", "a3", "a4"]
    # user ValueState rewritten only on user events
    vs = handle.value_states["user"]
    assert [u[0] for u in vs.updates] == ["N", "V2"]
    # final emission sees all three addresses despite incremental writes
    assert [a["address"] for a in out[-1]["addresses"]] == ["a2", "a3", "a4"]


def test_v2_batch_sorts_by_seq_like_v1():
    """Within-batch ordering comes from seq, not arrival order — feed a
    shuffled batch and assert both machines resolve it identically."""
    shuffled = [[_a_row("k", 3), _u_row("k", 1), _a_row("k", 2)]]
    v2_out, _ = _drive_v2("k", shuffled)
    # v1 sorts inside _make_join_state_machine, not _KeyJoinState — sort here
    pdf = next(_machine_rows(shuffled[0])).sort_values("seq", kind="stable")
    from data_stream_flink_user_address_spark.streaming.stateful_join import (
        _KeyJoinState,
    )

    s = _KeyJoinState("k")
    v1_sorted = [e for e in (s.on_row(r) for r in pdf.itertuples(index=False)) if e]
    assert v2_out == v1_sorted
    assert [[a["address"] for a in e["addresses"]] for e in v2_out] == [
        [], ["a2"], ["a2", "a3"],
    ]


def test_v2_transform_with_state_matches_traces(spark, tmp_path):
    """The transformWithStateInPandas implementation must reproduce the
    same emission traces as v1 (user-first growth, address-first
    buffering, cross-batch persistence).

    Skipped where ``google.protobuf`` is unavailable: Spark's
    transformWithState Python runner needs it for its state-server
    protocol, and this container does not ship it (the operator itself
    is environment-gated the same way).
    """
    pytest.importorskip("google.protobuf")
    from data_stream_flink_user_address_spark.streaming.stateful_join import (
        stateful_user_address_join_v2,
    )

    tmpdir = str(tmp_path)
    udir, adir = os.path.join(tmpdir, "users"), os.path.join(tmpdir, "addresses")
    os.makedirs(udir)
    os.makedirs(adir)
    qname = "v2_out_" + uuid.uuid4().hex[:8]
    users = spark.readStream.schema(USER_SEQ_SCHEMA).json(udir)
    addresses = spark.readStream.schema(ADDR_SEQ_SCHEMA).json(adir)
    out = stateful_user_address_join_v2(users, addresses)
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )

    def feed(d, rows):
        with open(os.path.join(d, f"{uuid.uuid4().hex}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        q.processAllAvailable()

    try:
        # batch 1: user-first trace + buffered orphan address
        feed(udir, [_user("v1", 1)])
        feed(adir, [_addr("v1", 2), _addr("v1", 3), _addr("x9", 50)])
        # batch 2: cross-batch append + late-arriving user for the orphan
        feed(adir, [_addr("v1", 4)])
        feed(udir, [_user("x9", 51)])
        rows = [r.asDict(recursive=True) for r in spark.sql(f"SELECT * FROM {qname}").collect()]
    finally:
        q.stop()

    def trace(key):
        es = sorted((r for r in rows if r["userId"] == key), key=lambda r: r["seq"])
        return [[a["address"] for a in e["addresses"]] for e in es]

    assert trace("v1") == [[], ["a2"], ["a2", "a3"], ["a2", "a3", "a4"]]
    assert trace("x9") == [["a50"]]  # buffered address released on user arrival
