"""BM25 full-text retrieval over a document table.

Engine extension beyond the reference surface: the classic
probabilistic relevance function (Robertson et al., Okapi BM25; the
(k1+1) tf normalization and the +1-smoothed idf are the Lucene
variant) as one declarative plan -- the retrieval primitive a
training-data pipeline uses for curation-by-search, contamination
hunting, and hard-negative mining.

Scale shape: the exploded postings are filtered to the QUERY'S terms
before anything groups or joins, so only matching postings survive the
map side -- corpus work is one scan + one doc-keyed aggregation of the
(usually tiny) matching subset.  Corpus statistics (N, avgdl) ride a
one-row broadcast; per-term document frequencies are a <=|query|-row
broadcast.  Nothing corpus-wide crosses an exchange except the matched
postings.

Determinism contract (shared with the DuckDB oracle): per-term score
contributions are fixed-point BIGINTs (round(x * 1e9)), so the per-doc
sum is exact integer arithmetic independent of accumulation order; the
final score divides back and rounds to ``round_digits``.  Ties break
on the smaller doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rounding import round_parity

from .text import _ASCII_LOWER, _ASCII_UPPER, lower_ascii, tokens

_FP = 1_000_000_000  # fixed-point scale for per-term contributions


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k docs by BM25: ``(doc_id, score, rank)``.

    ``query_terms`` are matched against lowercased whitespace tokens
    (compose with a real analyzer upstream if needed).  idf uses the
    +1-smoothed Lucene form ``ln(1 + (N - df + 0.5) / (df + 0.5))`` --
    always positive, so a term in most docs down-weights rather than
    flipping sign.
    """
    # ASCII-only lowering on both sides of the match, so term identity
    # is engine-portable (see functions/text.py:lower_ascii)
    terms = [
        t.translate(str.maketrans(_ASCII_UPPER, _ASCII_LOWER))
        for t in query_terms
    ]
    toks = tokens(lower_ascii(F.col(text_col)))
    d = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).withColumn("dl", F.size("__toks"))

    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    term_lit = F.array(*[F.lit(t) for t in terms])
    posts = (
        d.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .filter(F.array_contains(term_lit, F.col("term")))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = posts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    contrib_fp = F.round(idf * tf_norm * _FP).cast("bigint")

    scored = (
        posts.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select("doc_id", contrib_fp.alias("__c"))
        .groupBy("doc_id")
        .agg(F.sum("__c").alias("__score_fp"))
        .select(
            "doc_id",
            round_parity(F.col("__score_fp") / _FP, round_digits).alias("score"),
        )
    )
    # TakeOrderedAndProject (per-partition partial top-k, merged on the
    # driver) -- NOT a global row_number window, which would drag every
    # matched doc through one partition; the rank window then runs over
    # the k survivors only
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("bigint").alias("rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (the standard hybrid
    lexical+vector retrieval combiner, Cormack et al.'s RRF):
    ``score(d) = sum over lists of 1/(k + rank_d)``; documents missing
    from a list simply contribute nothing.  Inputs need
    ``(id_col, rank)`` columns -- :func:`bm25_topk` and the
    similarity-search top-ks both emit that shape.

    Scale shape: the inputs are top-k result sets (tens of rows), so
    the union + per-id sum is negligible at any corpus size -- the
    heavy lifting already happened inside each retriever.  Scores
    round to 1e-9 (sum order independence at double precision on
    <=dozens of terms); ties break on the smaller id, matching the
    BM25 contract.  Output: ``(id_col, rrf_score, rank)``, optionally
    cut to ``topk``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("__c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.groupBy(id_col)
        .agg(round_parity(F.sum("__c"), 9).alias("rrf_score"))
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    out = fused.select(
        id_col, "rrf_score", F.row_number().over(w).cast("bigint").alias("rank")
    )
    return out.filter(F.col("rank") <= topk) if topk else out
