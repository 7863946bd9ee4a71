"""Int8 scalar quantization for embedding columns, and quantized
candidate-generation top-k with exact rescoring.

Engine extension beyond the reference surface.  At 100 TB the embedding
column IS the dataset: a 64-dim float32 vector is 256 bytes; symmetric
per-vector int8 quantization stores 64 bytes + one float scale (~4x
less scan bandwidth and shuffle width), at a recall cost the exact
rescore pass below removes for top-k search (the standard
"SQ8 + refine" design, e.g. FAISS ``IndexScalarQuantizer`` + refine).

Determinism contract (shared with the DuckDB oracle): scale =
max(|x|)/127 guarded to 1e-30, codes = round(x/scale) with half-away-
from-zero rounding (both engines' ``round``), double math throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import NORM_FLOOR, _dot_unrolled, _norm, vec_is_finite


def quantize_codes(vec: Column, scale: Column) -> Column:
    """int codes for ``vec`` at ``scale`` (round half away from zero)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("int"))


def quantize_int8_frame(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Per-vector symmetric int8 codes: ``(vec_id, scale, qvec[, vec])``.

    One zero-shuffle projection: scale is the vector's max |x| / 127,
    codes are ``round(x / scale)`` in [-127, 127].  Reconstruction is
    ``code * scale``; per-element quantization error is at most
    scale/2.  ``keep_vec`` retains the float column (for rescoring).

    A vector with any non-finite component has NO int8 representation
    (``round(NaN)::int`` is a job-killing CAST_OVERFLOW under Spark
    ANSI, and absmax = inf would zero every other code): such rows emit
    ``scale = NULL, qvec = NULL`` -- the caller routes them to
    quarantine, they are never silently clamped.  Matches the oracle's
    ``isfinite`` CASE (r18 non-finite sweep).
    """
    absmax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    finite = vec_is_finite(vec_col)
    d = emb.select(
        F.col(id_col).alias("vec_id"),
        F.when(finite, F.greatest(absmax, F.lit(1e-30)) / 127.0).alias("scale"),
        F.col(vec_col).alias("vec"),
    ).withColumn(
        "qvec",
        F.when(
            F.col("scale").isNotNull(),
            quantize_codes(F.col("vec"), F.col("scale")),
        ),
    )
    return d if keep_vec else d.drop("vec")


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    expand: int = 4,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int = 6,
    corpus_quantized: DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine via int8 candidate generation + exact float rescore.

    Stage 1 ranks the quantized corpus by the reconstructed dot
    ``scale_c * scale_q * <qc, qq>``, keeping ``k * expand`` candidates
    per query (partial top-k per partition via WindowGroupLimit, same
    shape as brute_force_topk).  Stage 2 re-ranks only the survivors
    with exact float cosine -- quantization error survives only if a
    true top-k member fell below rank k*expand.  Output schema matches
    ``brute_force_topk`` (query_id, vec_id, cosine, rank) with EXACT
    cosines.

    Two corpus layouts:

    - ``corpus_quantized=None`` (default): quantize ``corpus`` on the
      fly in the same scan that carries the float vectors -- right when
      the source only stores floats.
    - ``corpus_quantized`` given (``(vec_id, scale, qvec)``, i.e. a
      persisted :func:`quantize_int8_frame` table): stage 1 scans ONLY
      the 4x-narrower codes table; the float ``corpus`` is touched in
      stage 2 alone, via a broadcast join against the (queries x
      k*expand)-row candidate set -- map-side, and with an id-sorted
      float layout (``sources/layout.py``) the row-group stats skip
      most of it.  This is the production shape the stored codes column
      exists for.  The frame must carry the exact
      ``quantize_int8_frame`` output names (``vec_id, scale, qvec``)
      regardless of what ``corpus_id`` the floats use -- the quantizer
      normalizes the id name on write, so a persisted table always has
      them; a renamed frame fails fast with an AnalysisException.
    """
    if corpus_quantized is None:
        qc = quantize_int8_frame(corpus, corpus_id, corpus_vec, keep_vec=True)
    else:
        qc = corpus_quantized.select("vec_id", "scale", "qvec")
    qq = quantize_int8_frame(queries, query_id, query_vec, keep_vec=True).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("qvec").alias("q_qvec"),
        F.col("vec").alias("q_vec"),
    )
    approx = qc.join(F.broadcast(qq)).withColumn(
        "approx_dot",
        # int8 code dots are double-exact (|sum| < 2^20 at dim 64);
        # _dot_unrolled is the shared codegen-unrolled kernel
        F.col("scale") * F.col("q_scale") * _dot_unrolled(F.col("qvec"), F.col("q_qvec"), dim),
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("vec_id").asc()
    )
    cand_cols = ["query_id", "vec_id", "q_vec"] + (
        ["vec"] if corpus_quantized is None else []
    )
    cand = (
        approx.withColumn("crank", F.row_number().over(w1))
        .filter(F.col("crank") <= k * expand)
        .select(*cand_cols)
    )
    if corpus_quantized is not None:
        floats = corpus.select(
            F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("vec")
        )
        cand = floats.join(F.broadcast(cand), "vec_id")
    cn = F.greatest(_norm(F.col("vec")), F.lit(NORM_FLOOR))
    qn = F.greatest(_norm(F.col("q_vec")), F.lit(NORM_FLOOR))
    exact = cand.withColumn(
        "cosine",
        F.round(_dot_unrolled(F.col("vec"), F.col("q_vec"), dim) / (cn * qn), round_digits),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )
