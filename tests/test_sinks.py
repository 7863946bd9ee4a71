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
