"""Keyed upsert sink semantics (MongoSink.java analogue) + full pipeline."""

import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from data_stream_flink_user_address_spark.schemas import ADDRESS_SCHEMA, USER_SCHEMA
from data_stream_flink_user_address_spark.streaming.sinks import KeyedUpsertSink
from data_stream_flink_user_address_spark.plans.pipeline import ReferencePipeline


def test_upsert_insert_then_overwrite(spark, tmp_path):
    path = str(tmp_path / "kv")
    sink = KeyedUpsertSink(spark, path, key="k", order_col="v")
    sink.apply(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"))
    sink.apply(spark.createDataFrame([("b", 99), ("c", 3)], "k string, v int"))
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 99, "c": 3}


def test_upsert_last_write_wins_within_batch(spark, tmp_path):
    path = str(tmp_path / "kv")
    sink = KeyedUpsertSink(spark, path, key="k", order_col="v")
    sink.apply(spark.createDataFrame([("a", 5), ("a", 9), ("a", 7)], "k string, v int"))
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 9}


def test_upsert_idempotent_replay(spark, tmp_path):
    # micro-batch retry: applying the same batch twice converges
    path = str(tmp_path / "kv")
    sink = KeyedUpsertSink(spark, path, key="k", order_col="v")
    batch = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    sink.apply(batch)
    sink.apply(batch)
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 2}


USER_SEQ = T.StructType(USER_SCHEMA.fields + [T.StructField("seq", T.LongType())])
ADDR_SEQ = T.StructType(ADDRESS_SCHEMA.fields + [T.StructField("seq", T.LongType())])


def test_full_pipeline_end_to_end(spark, tmp_path):
    """10 users x 3 addresses (the reference generator workload,
    user-generator.py:27,52) through the complete topology."""
    udir, adir = str(tmp_path / "u"), str(tmp_path / "a")
    os.makedirs(udir)
    os.makedirs(adir)
    out = str(tmp_path / "out")
    seq = 0
    with open(os.path.join(udir, "u.json"), "w") as fu, open(os.path.join(adir, "a.json"), "w") as fa:
        for i in range(10):
            seq += 1
            fu.write(json.dumps({"id": f"u{i}", "name": f"name{i}", "email": f"e{i}@x.com",
                                 "genre": "F", "registerDate": None, "seq": seq}) + "\n")
            for j in range(3):
                seq += 1
                fa.write(json.dumps({"userId": f"u{i}", "address": f"addr{i}-{j}", "city": "c",
                                     "state": f"S{j}", "zipCode": "z", "country": f"C{i % 2}",
                                     "seq": seq}) + "\n")

    users = spark.readStream.schema(USER_SEQ).json(udir)
    addresses = spark.readStream.schema(ADDR_SEQ).json(adir)
    # transactional=False pins THIS test to the parquet-directory
    # backend (the raw spark.read.parquet assertions below are
    # backend-specific); the commit-log default runs in test_txn_sink.py
    pipe = ReferencePipeline(spark, users, addresses, out, str(tmp_path / "ckpt"),
                             transactional=False)
    pipe.start()
    try:
        pipe.process_all()
    finally:
        pipe.stop()

    # userAddress: upsert collapses the 4-emission inflation to final snapshots
    ua = spark.read.parquet(os.path.join(out, "userAddress"))
    rows = {r["userId"]: r for r in ua.collect()}
    assert len(rows) == 10
    assert all(len(r["addresses"]) == 3 for r in rows.values())

    # count tables exist, keyed by dimension; inflation counts S0 addresses
    # once per subsequent snapshot (SURVEY.md SS2.3): S0 in [a0],[a0,a1],[a0,a1,a2]
    st = {r["state"]: r["count"] for r in spark.read.parquet(os.path.join(out, "userCountByState")).collect()}
    assert st == {"S0": 30, "S1": 20, "S2": 10}
    co = spark.read.parquet(os.path.join(out, "userCountByCountry")).collect()
    assert sum(r["count"] for r in co) == 60 and {r["country"] for r in co} == {"C0", "C1"}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """A batch must rewrite only the hash buckets its keys land in --
    files in untouched bucket directories stay byte-identical."""
    path = str(tmp_path / "kv")
    sink = KeyedUpsertSink(spark, path, key="k", order_col="v", n_buckets=8)
    sink.apply(
        spark.createDataFrame([(f"key{i}", i) for i in range(40)], "k string, v int")
    )

    def bucket_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith("__bucket="):
                full = os.path.join(path, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                }
        return out

    before = bucket_files()
    # single-key batch touches exactly one bucket
    sink.apply(spark.createDataFrame([("key0", 999)], "k string, v int"))
    after = bucket_files()

    from pyspark.sql import functions as F
    touched = f"__bucket={spark.range(1).select(F.pmod(F.xxhash64(F.lit('key0')), F.lit(8))).first()[0]}"
    assert before.keys() == after.keys()
    for b in before:
        if b == touched:
            assert before[b] != after[b]  # rewritten
        else:
            assert before[b] == after[b]  # untouched

    got = {r["k"]: r["v"] for r in sink.read().collect()}
    assert got["key0"] == 999 and len(got) == 40


def _write_workload(tmp_path, n_users=8):
    udir, adir = str(tmp_path / "u"), str(tmp_path / "a")
    os.makedirs(udir, exist_ok=True)
    os.makedirs(adir, exist_ok=True)
    seq = 0
    with open(os.path.join(udir, "u.json"), "w") as fu, \
         open(os.path.join(adir, "a.json"), "w") as fa:
        for i in range(n_users):
            seq += 1
            fu.write(json.dumps({"id": f"u{i}", "name": f"name{i}",
                                 "email": f"e{i}@x.com", "genre": "F",
                                 "registerDate": None, "seq": seq}) + "\n")
            for j in range(3):
                seq += 1
                fa.write(json.dumps({"userId": f"u{i}", "address": f"addr{i}-{j}",
                                     "city": "c", "state": f"S{j}", "zipCode": "z",
                                     "country": f"C{i % 2}", "seq": seq}) + "\n")
    return udir, adir


def _run_pipeline(spark, tmp_path, mode):
    udir, adir = _write_workload(tmp_path / mode)
    out = str(tmp_path / mode / "out")
    users = spark.readStream.schema(USER_SEQ).json(udir)
    addresses = spark.readStream.schema(ADDR_SEQ).json(adir)
    pipe = ReferencePipeline(spark, users, addresses, out,
                             str(tmp_path / mode / "ckpt"),
                             window="365 days", transactional=False, mode=mode)
    pipe.start()
    try:
        pipe.process_all()
    finally:
        pipe.stop()
    return pipe


def test_shared_mode_matches_per_sink_mode(spark, tmp_path):
    """The shared-join foreachBatch multiplexer (one join execution)
    must land the same three final tables as the legacy three-query
    layout (join executed per sink)."""
    shared = _run_pipeline(spark, tmp_path, "shared")
    legacy = _run_pipeline(spark, tmp_path, "per_sink")

    for table, key in (("userAddress", "userId"),
                       ("userCountByState", "state"),
                       ("userCountByCountry", "country")):
        s = {r[key]: r for r in shared.sinks[table].read().collect()}
        l = {r[key]: r for r in legacy.sinks[table].read().collect()}
        assert set(s) == set(l), table
        if table == "userAddress":
            for k in s:
                assert [a["address"] for a in s[k]["addresses"]] == \
                       [a["address"] for a in l[k]["addresses"]]
        else:
            assert {k: v["count"] for k, v in s.items()} == \
                   {k: v["count"] for k, v in l.items()}, table


def test_shared_mode_epoch_replay_guard(spark, tmp_path):
    """Re-running a micro-batch with the same epoch id (Structured
    Streaming retry) must not double-count the windowed totals."""
    from pyspark.sql import functions as F
    from data_stream_flink_user_address_spark.plans.pipeline import ReferencePipeline as RP

    out = str(tmp_path / "out")
    pipe = RP.__new__(RP)  # only _merge_window_counts is exercised
    pipe.window = "365 days"
    pipe._run_id = "runA"
    sink = KeyedUpsertSink(spark, os.path.join(out, "c"), key="state")

    batch = spark.createDataFrame(
        [("u1", [("a1", "c", "S0", "z", "C0")]),
         ("u2", [("a2", "c", "S0", "z", "C0"), ("a3", "c", "S1", "z", "C0")])],
        "userId string, addresses array<struct<address:string,city:string,state:string,zipCode:string,country:string>>",
    ).withColumn("ingest_time", F.current_timestamp())

    pipe._merge_window_counts(sink, batch, "state", epoch_id=0)
    first = {r["state"]: r["count"] for r in sink.read().collect()}
    assert first == {"S0": 2, "S1": 1}

    # replay of epoch 0: counts must be unchanged
    pipe._merge_window_counts(sink, batch, "state", epoch_id=0)
    assert {r["state"]: r["count"] for r in sink.read().collect()} == first

    # a genuine next batch (epoch 1) accumulates within the same window
    pipe._merge_window_counts(sink, batch, "state", epoch_id=1)
    assert {r["state"]: r["count"] for r in sink.read().collect()} == \
        {"S0": 4, "S1": 2}

    # checkpoint recreated over the SAME out_dir: batchIds restart and a
    # NEW run's batch arrives carrying the same epoch number (1) the
    # table already stores.  Raw __epoch equality dropped it (undercount,
    # VERDICT r10 wrong #3); with the __run namespace the stored rows
    # read as prior totals and accumulation continues.
    pipe._run_id = "runB"
    pipe._merge_window_counts(sink, batch, "state", epoch_id=1)
    assert {r["state"]: r["count"] for r in sink.read().collect()} == \
        {"S0": 6, "S1": 3}
    # and a retry of that new-run batch is still skipped
    pipe._merge_window_counts(sink, batch, "state", epoch_id=1)
    assert {r["state"]: r["count"] for r in sink.read().collect()} == \
        {"S0": 6, "S1": 3}


def test_merge_window_counts_over_legacy_per_sink_table(spark, tmp_path):
    """Upgrade-over-existing-out_dir continuation (r11 ADVICE medium):
    a count table persisted by the per_sink mode (or a pre-namespace
    run) physically lacks __epoch/__run.  The shared stream's first
    batch merges THROUGH KeyedUpsertSink.apply, whose unionByName must
    tolerate the narrower stored schema (allowMissingColumns) instead
    of raising AnalysisException; and survivors that came out of that
    union carrying NULL __epoch/__run must read as prior totals on the
    NEXT merge (coalesce-to-sentinel), not be dropped by a
    three-valued-logic ~NULL filter."""
    from pyspark.sql import functions as F
    from data_stream_flink_user_address_spark.plans.pipeline import ReferencePipeline as RP

    pipe = RP.__new__(RP)
    pipe.window = "365 days"
    pipe._run_id = "runA"
    # n_buckets=1: every stored key shares the incoming keys' bucket, so
    # non-batch keys flow through the union as survivors deterministically
    sink = KeyedUpsertSink(spark, str(tmp_path / "cnt"), key="state", n_buckets=1)

    stamp = "2026-01-15 00:00:00"
    wstart = spark.sql(
        f"SELECT window(timestamp'{stamp}', '365 days').start AS s"
    ).collect()[0]["s"]
    # per_sink-mode layout: (dim, count, window_start) only
    sink.apply(spark.createDataFrame(
        [("S0", 5, wstart), ("S9", 7, wstart)],
        "state string, count bigint, window_start timestamp",
    ))
    assert "__epoch" not in sink.read().columns

    def batch(*states):
        return spark.createDataFrame(
            [("u", [("a", "c", s, "z", "C0")]) for s in states],
            "userId string, addresses array<struct<address:string,city:string,"
            "state:string,zipCode:string,country:string>>",
        ).withColumn("ingest_time", F.lit(stamp).cast("timestamp"))

    # first shared-mode batch over the legacy table: must not raise, and
    # the legacy count reads as a prior total
    pipe._merge_window_counts(sink, batch("S0"), "state", epoch_id=0)
    got = {r["state"]: r["count"] for r in sink.read().collect()}
    assert got == {"S0": 6, "S9": 7}

    # S9 was rewritten as a NULL-__epoch/__run survivor of that merge;
    # the next batch touching it must accumulate, not drop it
    pipe._merge_window_counts(sink, batch("S9"), "state", epoch_id=1)
    got = {r["state"]: r["count"] for r in sink.read().collect()}
    assert got == {"S0": 6, "S9": 8}

    # and the normal replay guard still holds on the upgraded table
    pipe._merge_window_counts(sink, batch("S9"), "state", epoch_id=1)
    assert {r["state"]: r["count"] for r in sink.read().collect()} == got


def test_run_namespace_marker_survives_restart(tmp_path):
    """Same checkpoint dir -> same run id (true replays still skipped
    after a driver restart); recreated checkpoint -> fresh id."""
    from data_stream_flink_user_address_spark.plans.pipeline import ReferencePipeline as RP

    ckpt = str(tmp_path / "ckpt" / "shared")
    first = RP._run_namespace(ckpt)
    assert RP._run_namespace(ckpt) == first  # restart, intact checkpoint
    import shutil
    shutil.rmtree(ckpt)
    assert RP._run_namespace(ckpt) != first  # recreated checkpoint
