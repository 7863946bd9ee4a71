"""Int8 quantization invariants and the SQ8+refine top-k's agreement
with exact brute force."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.functions.quantize import (
    quantize_int8_frame,
    quantized_topk,
)
from data_stream_flink_user_address_spark.functions.similarity import brute_force_topk

SF = "/root/testdata/sf0.001"


def _embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codes_bounded_and_error_within_half_scale(spark):
    q = quantize_int8_frame(_embs(spark), keep_vec=True)
    checked = q.select(
        F.array_max(F.transform(F.col("qvec"), lambda c: F.abs(c))).alias("maxcode"),
        F.array_max(
            F.zip_with(
                F.col("vec"),
                F.col("qvec"),
                lambda x, c: F.abs(x.cast("double") - c * F.col("scale")),
            )
        ).alias("maxerr"),
        F.col("scale"),
    ).collect()
    assert checked
    for r in checked:
        assert r.maxcode <= 127
        # round() reconstruction error is at most scale/2 (+ float eps)
        assert r.maxerr <= r.scale / 2 + 1e-12


def test_zero_vector_quantizes_to_zero_codes(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8_frame(df).collect()}
    assert rows[1].qvec == [0, 0, 0, 0]
    assert rows[2].qvec == [64, -127, 32, 0]  # scale = 2/127


def test_quantized_topk_matches_brute_force(spark):
    e = _embs(spark)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_topk(e, q, k=5)
    sq8 = quantized_topk(e, q, k=5, expand=4)
    a = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
    b = {(r.query_id, r.vec_id, r.rank) for r in sq8.collect()}
    # int8 at 64 dims: the refine stage recovers the exact ranking
    overlap = len(a & b) / len(a)
    assert overlap >= 0.95, overlap


def test_prequantized_table_path_matches_on_the_fly(spark, tmp_path):
    """The production layout -- stage 1 over a persisted codes table,
    floats touched only for the refine -- returns the identical result,
    and its stage-1 scan never reads the float column."""
    import contextlib
    import io

    e = _embs(spark)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes_path = str(tmp_path / "codes")
    quantize_int8_frame(e).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)

    a = quantized_topk(e, q, k=5, expand=4)
    b = quantized_topk(e, q, k=5, expand=4, corpus_quantized=codes)
    ra = sorted((r.query_id, r.vec_id, r.cosine, r.rank) for r in a.collect())
    rb = sorted((r.query_id, r.vec_id, r.cosine, r.rank) for r in b.collect())
    assert ra == rb

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        b.explain("formatted")
    plan = buf.getvalue()
    # stage 1 must rank over the codes table alone: exactly one scan
    # reads qvec, embedding scans exist only for the (tiny, filtered)
    # query side and the refine lookup, and the candidate-ranking
    # Window's input must NOT carry the corpus float column ("vec" --
    # a regression that drags floats through stage 1 puts it there)
    import re

    schemas = [
        seg.split("ReadSchema:", 1)[1].splitlines()[0]
        for seg in plan.split("Scan parquet")[1:]
        if "ReadSchema:" in seg
    ]
    assert sum("qvec" in s for s in schemas) == 1, schemas
    for seg in plan.split(") Window")[1:]:
        inputs = [l for l in seg.splitlines() if l.startswith("Input")]
        if inputs and "approx_dot" in inputs[0]:
            assert not re.search(r"[\[, ]vec#", inputs[0]), inputs[0]
