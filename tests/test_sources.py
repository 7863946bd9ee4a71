"""Source-layer tests: JSON wire decode, file readers, generator.

Pins the Jackson-parity behaviors of SURVEY.md SS1.2-1.3: explicit
StructType (no inference), missing JSON fields -> null, malformed record
-> null row, and the producer's exact timestamp wire format
(%Y-%m-%dT%H:%M:%S.%f%z -- user-generator.py:22).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.schemas import USER_SCHEMA
from data_stream_flink_user_address_spark.sources.files import read_csv, read_json, read_parquet
from data_stream_flink_user_address_spark.sources.generator import (
    generate_addresses,
    generate_users,
)
from data_stream_flink_user_address_spark.sources.json_decode import decode_user_json


def test_decode_user_wire_timestamp(spark):
    """The producer writes ISO-8601 with microseconds and offset."""
    raw = spark.createDataFrame(
        [
            ('{"id":"u1","name":"N","email":"n@x.com","genre":"F",'
             '"registerDate":"2024-03-05T10:11:12.123456+0000"}',),
        ],
        "value string",
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    row = decode_user_json(raw).collect()[0]
    assert row["id"] == "u1"
    assert row["registerDate"] is not None
    assert row["registerDate"].strftime("%Y-%m-%d %H:%M:%S.%f") == "2024-03-05 10:11:12.123456"


def test_decode_missing_field_is_null_and_malformed_is_null_row(spark):
    raw = spark.createDataFrame(
        [
            ('{"id":"u1","name":"OnlyName"}',),   # missing fields -> nulls
            ("this is not json at all",),          # malformed -> null row
        ],
        "value string",
    )
    rows = decode_user_json(raw).collect()
    assert rows[0]["id"] == "u1" and rows[0]["email"] is None
    assert all(rows[1][f] is None for f in ("id", "name", "email", "genre"))


def test_read_json_and_csv_with_explicit_schema(spark, tmp_path):
    jdir = str(tmp_path / "j")
    os.makedirs(jdir)
    with open(os.path.join(jdir, "d.json"), "w") as f:
        f.write('{"id":"a","name":"A","email":"a@x","genre":"F","registerDate":null}\n')
    got = read_json(spark, jdir, USER_SCHEMA).collect()
    assert len(got) == 1 and got[0]["id"] == "a"

    cdir = str(tmp_path / "c")
    os.makedirs(cdir)
    with open(os.path.join(cdir, "d.csv"), "w") as f:
        f.write("id,name,email,genre,registerDate\nb,B,b@x,M,\n")
    got = read_csv(spark, cdir, USER_SCHEMA).collect()
    assert len(got) == 1 and got[0]["id"] == "b" and got[0]["registerDate"] is None


def test_read_parquet_prunes_columns(spark, tmp_path):
    p = str(tmp_path / "p")
    spark.range(10).withColumn("x", F.lit("v")).withColumn("y", F.lit(1)).write.parquet(p)
    df = read_parquet(spark, p, columns=["id", "y"])
    assert df.columns == ["id", "y"]
    # pruning must reach the scan, not just the output projection
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "ReadSchema: struct<id:bigint,y:int>" in buf.getvalue()


def test_generator_is_deterministic_with_fk_integrity(spark):
    u1 = generate_users(spark, n=10).collect()
    u2 = generate_users(spark, n=10).collect()
    assert sorted(map(str, u1)) == sorted(map(str, u2))
    users = {r["id"] for r in u1}
    addrs = generate_addresses(spark, n_users=10, addresses_per_user=3).collect()
    assert len(addrs) == 30
    assert {a["userId"] for a in addrs} == users  # every address joins a user


def test_register_views_enables_sql(spark):
    from data_stream_flink_user_address_spark.sources.tables import register_views

    names = register_views(spark, "/root/testdata/sf0.001", suffix="_t")
    assert "lineitem_t" in names and "events_t" in names
    row = spark.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem_t "
        "GROUP BY l_returnflag ORDER BY n DESC LIMIT 1"
    ).first()
    assert row["n"] > 0
    # events view must carry the ns->us timestamp conversion
    assert dict(spark.sql("SELECT * FROM events_t").dtypes)["ts"] == "timestamp"


def test_kafka_source_fails_cleanly_without_connector(spark):
    """The kafka-sql connector jar is a deploy-time dependency; without
    it the source must fail with Spark's missing-data-source error (not
    an obscure crash), documenting what to add to spark-submit."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from data_stream_flink_user_address_spark.schemas import USER_SCHEMA
    from data_stream_flink_user_address_spark.sources.kafka import kafka_json_stream

    with pytest.raises(AnalysisException, match="[Kk]afka"):
        kafka_json_stream(spark, "user", USER_SCHEMA)


def test_kafka_round_trip_when_broker_available(spark, tmp_path):
    """Full wire round-trip of the reference ingress (Main.java:51-67):
    produce the generator's 10 users x 3 addresses as wire JSON to real
    Kafka topics, consume with kafka_json_stream (both decoders), run
    the stateful emit-per-event join, upsert into the transactional
    sink, and check the converged table against the generator's truth.

    Container-gated: skips unless a broker answers on
    $KAFKA_BOOTSTRAP (default localhost:9092) AND the spark-sql-kafka
    connector is on the classpath (add
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``
    to spark-submit to enable).
    """
    import socket
    import uuid

    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException
    from pyspark.sql import functions as F

    from data_stream_flink_user_address_spark.schemas import (
        ADDRESS_SCHEMA,
        USER_SCHEMA,
        WIRE_TIMESTAMP_FORMAT,
    )
    from data_stream_flink_user_address_spark.sources.generator import (
        generate_addresses,
        generate_users,
    )
    from data_stream_flink_user_address_spark.sources.kafka import kafka_json_stream
    from data_stream_flink_user_address_spark.streaming.sinks import (
        TransactionalKeyedUpsertSink,
    )
    from data_stream_flink_user_address_spark.streaming.stateful_join import (
        stateful_user_address_join,
    )

    bootstrap = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")
    host, _, port = bootstrap.rpartition(":")
    try:
        socket.create_connection((host, int(port)), timeout=2).close()
    except OSError:
        pytest.skip(f"no Kafka broker reachable at {bootstrap}")

    run = uuid.uuid4().hex[:8]
    utopic, atopic = f"user-rt-{run}", f"address-rt-{run}"
    try:
        users_stream = kafka_json_stream(
            spark, utopic, USER_SCHEMA, bootstrap_servers=bootstrap, decode="user"
        )
        addrs_stream = kafka_json_stream(
            spark, atopic, ADDRESS_SCHEMA, bootstrap_servers=bootstrap, decode="address"
        )
    except AnalysisException:
        pytest.skip("spark-sql-kafka connector not on the classpath")

    # --- produce: the reference's user-generator workload as wire JSON
    users = generate_users(spark, n=10)
    addresses = generate_addresses(spark, n_users=10)
    (
        users.select(
            F.to_json(
                F.struct(*USER_SCHEMA.fieldNames()),
                {"timestampFormat": WIRE_TIMESTAMP_FORMAT},
            ).alias("value")
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", utopic)
        .save()
    )
    (
        addresses.select(
            F.to_json(F.struct(*ADDRESS_SCHEMA.fieldNames())).alias("value")
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", atopic)
        .save()
    )

    # --- consume -> join -> sink.  No seq column crosses the wire, so
    # the deterministic last-write winner is the emission with the most
    # addresses (emit-per-event only fires once the user is present and
    # the list grows monotonically: the max-size row IS the final
    # snapshot).
    joined = stateful_user_address_join(users_stream, addrs_stream, seq_col=None)
    sink = TransactionalKeyedUpsertSink(
        spark, str(tmp_path / "ua"), key="userId", order_col="n_addr"
    )
    q = (
        joined.withColumn("n_addr", F.size("addresses"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["userId"]: r
        for r in sink.read().collect()
    }
    expected_users = {r["id"]: r for r in users.collect()}
    expected_addrs: dict[str, set] = {}
    for r in addresses.collect():
        expected_addrs.setdefault(r["userId"], set()).add(r["address"])
    assert set(got) == set(expected_users)
    for uid, row in got.items():
        assert row["userName"] == expected_users[uid]["name"]
        assert row["userEmail"] == expected_users[uid]["email"]
        assert {a["address"] for a in row["addresses"]} == expected_addrs[uid]
        assert len(row["addresses"]) == 3
