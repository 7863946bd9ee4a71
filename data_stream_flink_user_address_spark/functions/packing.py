"""Sequence packing for LLM training: map every document into the
global concatenated-token stream and the fixed-length chunks (GPT-style
"concat then split every L tokens") it lands in.

Engine extension beyond the reference surface.  Training-data prep ends
by concatenating the tokenized corpus (one separator token between
docs) and slicing it into ``seq_len``-token blocks; to shard that work,
each document needs its OFFSET in the global stream -- an exclusive
prefix sum over per-doc token counts in a defined order (doc id here).

The naive Spark spelling -- ``sum().over(Window.orderBy(id))`` with no
partition key -- funnels the ENTIRE corpus through one task (Spark
plans an un-partitioned ordered window single-partition) and is exactly
the scale killer this module exists to avoid.  Instead the classic
two-phase distributed prefix sum:

1. bucket docs by id range (``floor(id / bucket_size)``) -- per-bucket
   windows are partition-local;
2. aggregate one row per bucket (its token-count sum), cumulate THOSE
   with an ordered window -- thousands of rows, not billions, so the
   single-partition window is paid on a frame that fits one task by
   construction;
3. broadcast-join the bucket base offsets back and add the local
   within-bucket prefix.

Shuffle inventory: one bucket-keyed exchange for the local window, one
kilobyte-scale broadcast back.  The corpus text itself never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count, tokens


def sequence_pack_offsets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 2048,
    sep_tokens: int = 1,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Global stream offsets + chunk assignment per document.

    Documents concatenate in ``id_col`` order, each followed by
    ``sep_tokens`` separator token(s).  Output per doc:
    ``(doc_id, n_tokens, start_offset, end_offset, first_chunk,
    last_chunk, n_chunks_spanned)`` where chunk ``c`` covers global
    offsets ``[c * seq_len, (c+1) * seq_len)`` and ``end_offset`` is
    exclusive of the separator.  A doc with ``first_chunk !=
    last_chunk`` crosses a block boundary (downstream either splits it
    or masks across the seam -- both need exactly these offsets).
    """
    d = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
    ).withColumn("__bucket", F.floor(F.col(id_col) / bucket_size))
    costed = d.withColumn("__cost", F.col("n_tokens") + sep_tokens)

    wloc = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = costed.withColumn("__local_incl", F.sum("__cost").over(wloc))

    bucket_tot = costed.groupBy("__bucket").agg(F.sum("__cost").alias("__btot"))
    wbuck = (
        Window.orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix over BUCKET sums: tiny frame, single task by design
    bases = bucket_tot.withColumn(
        "__base", F.sum("__btot").over(wbuck) - F.col("__btot")
    ).select("__bucket", "__base")

    out = local.join(F.broadcast(bases), "__bucket").select(
        id_col,
        "n_tokens",
        (F.col("__base") + F.col("__local_incl") - F.col("__cost")).alias(
            "start_offset"
        ),
        (F.col("__base") + F.col("__local_incl") - sep_tokens).alias("end_offset"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        "end_offset",
        F.floor(F.col("start_offset") / seq_len).cast("bigint").alias("first_chunk"),
        # last token of the doc sits at end_offset - 1; empty docs span
        # the chunk their (zero-width) start falls in
        F.floor(
            F.greatest(F.col("end_offset") - 1, F.col("start_offset")) / seq_len
        ).cast("bigint").alias("last_chunk"),
    ).withColumn(
        "n_chunks_spanned", (F.col("last_chunk") - F.col("first_chunk") + 1)
    )


def chunk_manifest(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 2048,
    sep_tokens: int = 1,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Per-chunk composition: one row per (chunk, document) overlap.

    Explodes each doc's spanned-chunk range from
    :func:`sequence_pack_offsets` into
    ``(chunk_id, doc_id, doc_token_start, n_tokens_in_chunk)`` --
    ``doc_token_start`` is the 0-based index WITHIN the document where
    this chunk's slice begins.  This is the shard-able recipe a packing
    writer consumes: group by chunk_id, slice each doc's token array,
    concatenate.

    The explode factor per doc is ``n_tokens/seq_len + 1`` -- the
    output is ~``total_tokens/seq_len`` rows beyond the doc count, i.e.
    linear in corpus size with a 1/seq_len constant; no shuffle beyond
    the prefix-sum machinery it builds on (the explode is map-side).
    Empty docs (zero tokens) contribute no manifest rows.
    """
    offs = sequence_pack_offsets(
        df, text_col, id_col, seq_len=seq_len,
        sep_tokens=sep_tokens, bucket_size=bucket_size,
    )
    chunk = F.explode(
        F.sequence(F.col("first_chunk"), F.col("last_chunk"))
    ).alias("chunk_id")
    e = offs.filter(F.col("n_tokens") > 0).select(
        id_col, "n_tokens", "start_offset", "end_offset", chunk
    )
    lo = F.greatest(F.col("start_offset"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("end_offset"), (F.col("chunk_id") + 1) * seq_len)
    return (
        e.select(
            F.col("chunk_id"),
            F.col(id_col),
            (lo - F.col("start_offset")).alias("doc_token_start"),
            (hi - lo).alias("n_tokens_in_chunk"),
        )
        .filter(F.col("n_tokens_in_chunk") > 0)
    )


def overlap_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_len: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Per-document sliding-window chunker (the RAG / long-context
    ingestion primitive, complementing the GPT-style cross-document
    packing above): each doc's token sequence is cut into windows of
    ``chunk_len`` tokens that advance by ``chunk_len - overlap``, so
    consecutive chunks share ``overlap`` tokens of context.  Output one
    row per chunk: ``(doc_id, chunk_id, start_tok, n_chunk_tokens,
    chunk_text)``; the final chunk may be short, a doc with
    ``n <= chunk_len`` tokens yields exactly one chunk, and empty docs
    yield none.  ``chunk_text`` re-joins the whitespace-token slice
    with single spaces (the tokenizer's inverse up to whitespace
    runs).

    Scale shape: ENTIRELY row-local -- tokenize, compute the chunk
    count arithmetically, explode a ``sequence()`` of chunk ids, and
    ``slice()`` the token array per chunk.  Zero shuffles, zero
    windows, no driver involvement; the explode factor is
    ``~n_tokens/stride`` rows per doc, linear in corpus size.  Chunks
    inherit the input's partitioning, so a downstream embed/index
    stage starts co-located by document.
    """
    if not 0 <= overlap < chunk_len:
        raise ValueError(
            f"need 0 <= overlap < chunk_len, got {overlap=} {chunk_len=}"
        )
    stride = chunk_len - overlap
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    n_chunks = F.when(F.col("__n") <= chunk_len, F.lit(1)).otherwise(
        1 + F.floor((F.col("__n") - chunk_len + stride - 1) / stride)
    )
    e = (
        toks.filter(F.col("__n") > 0)
        .withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))),
        )
        .withColumn("start_tok", (F.col("chunk_id") * stride).cast("bigint"))
    )
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "start_tok",
        F.least(F.lit(chunk_len), F.col("__n") - F.col("start_tok"))
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice("__toks", F.col("start_tok") + 1, F.lit(chunk_len))
        ).alias("chunk_text"),
    )
