"""The curation/sampling operators on a live stream.

Every stage of the batch curation recipe that is a row-local projection
(PII redaction, quality/language scoring, hash sampling/splitting) must
run UNCHANGED on ``readStream`` — that is the point of expressing them
as pure column expressions: one code path serves backfill and the live
feed, and the hash-based sampler makes a REPLAYED micro-batch reselect
the identical rows (rand() cannot).  Pinned here with a file-source
stream, including a second batch to prove cross-batch determinism.
"""

import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_stream_flink_user_address_spark.functions.curation import pii_redact
from data_stream_flink_user_address_spark.functions.sampling import hash_split
from data_stream_flink_user_address_spark.functions.text import (
    language_id,
    quality_score,
    tokens,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write(d, fname, rows):
    with open(os.path.join(d, fname), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_curation_stages_run_on_a_stream(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    name = f"cur_{uuid.uuid4().hex[:8]}"

    stream = spark.readStream.schema(SCHEMA).json(src)
    curated = hash_split(
        pii_redact(stream)
        .withColumn("__toks", tokens("text"))
        .withColumn("lang", language_id("text"))
        .withColumn("quality", quality_score("text"))
        .drop("__toks"),
        {"train": 0.5, "test": 0.5},
        seed=7,
    )
    q = (
        curated.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        batch1 = [
            (1, "mail me at a@b.com about the big fast table scan"),
            (2, "la de la en un es el que la de en un es"),
        ]
        _write(src, "b1.json", batch1)
        q.processAllAvailable()
        batch2 = [(3, "ssn 123-45-6789 and the quick value row"), (4, "")]
        _write(src, "b2.json", batch2)
        q.processAllAvailable()
        rows = {r["doc_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()

    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["n_email"] == 1 and "[EMAIL]" in rows[1]["redacted"]
    assert rows[3]["n_ssn"] == 1 and "[SSN]" in rows[3]["redacted"]
    assert rows[1]["lang"] == "en" and rows[2]["lang"] == "es"
    assert rows[4]["quality"] == 0.25  # empty text: only the punct term
    assert all(r["split"] in ("train", "test") for r in rows.values())

    # cross-batch determinism: the stream's split assignment equals the
    # batch API's on the same keys -- replay/backfill selects the same rows
    batch_df = spark.createDataFrame(batch1 + batch2, "doc_id long, text string")
    batch_split = {
        r["doc_id"]: r["split"]
        for r in hash_split(batch_df, {"train": 0.5, "test": 0.5}, seed=7).collect()
    }
    assert {k: v["split"] for k, v in rows.items()} == batch_split
