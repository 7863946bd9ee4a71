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


def _order_preserving_bucket(
    d: DataFrame, id_col: str, bucket_size: int
) -> DataFrame:
    """Add an ORDER-PRESERVING ``__bucket`` column: sorting by
    (bucket, id) must equal sorting by id -- the invariant the
    two-phase distributed prefix sum rests on, which is why
    :func:`histogram_pack`'s hash-bucket trick is NOT usable here
    (hashes scramble the concatenation order).

    Numeric ids bucket by floor division: zero extra passes, exact
    ``bucket_size`` occupancy for dense ids.  String ids (URL or UUID
    keys) take one extra aggregate pass over the (already slim,
    lazily-materialized) count frame: a 7-byte big-endian prefix proxy
    -- monotone in the UTF8_BINARY string order Spark sorts by -- feeds
    ``percentile_approx``, and each row finds its bucket through a
    BINARY-SEARCH ``when`` tree over the collected cut points --
    O(log n_buckets) comparisons per row, where the
    ``curriculum_order`` linear cut-count idiom (fine for its
    handful of stages) would cost O(n_buckets) per row here.  The cut
    count is additionally capped at 4096: past ``4096 * bucket_size``
    docs the bucket occupancy (and so the rank-window partition and
    the phase-2 single-task frame) grows as n/4096 instead of holding
    at ``bucket_size`` -- still thousands of times smaller than the
    corpus; raise ``bucket_size`` with the corpus as the module
    docstring already directs.  Ids sharing a cut-straddling proxy
    land in one bucket: occupancy can exceed the target only when many
    ids share their first 7 bytes, order is preserved regardless.
    Other id types raise -- a silent wrong-order concat would corrupt
    every downstream chunk.
    """
    from pyspark.sql import types as T

    dtype = d.schema[id_col].dataType
    if isinstance(
        dtype,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        return d.withColumn("__bucket", F.floor(F.col(id_col) / bucket_size))
    if not isinstance(dtype, T.StringType):
        raise TypeError(
            f"sequence packing needs a numeric or string id to define "
            f"the concatenation order; got {dtype.simpleString()} for "
            f"{id_col!r}"
        )
    # slim frame referenced by count + cuts + the main pass: materialize
    # lazily or the upstream token scan runs three times (pitfall #1)
    d = d.localCheckpoint(eager=False)
    # column-API rpad over binary (no SQL-text interpolation of the id
    # name -- quoting-hostile column names must work like any other)
    padded = F.call_function(
        "rpad", F.col(id_col).cast("binary"), F.lit(7), F.lit(b"\x00")
    )
    proxy = F.coalesce(
        F.conv(F.hex(padded), 16, 10).cast("bigint"),
        F.lit(0),
    )
    p = d.withColumn("__proxy", proxy)
    n_docs = p.count()
    n_buckets = min(max(1, -(-n_docs // bucket_size)), 4096)
    if n_buckets == 1:
        return p.drop("__proxy").withColumn("__bucket", F.lit(0).cast("bigint"))
    fracs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, int(n_buckets))]
    )
    (cut_vals,) = p.agg(
        F.percentile_approx("__proxy", fracs, F.lit(10_000)).alias("__cuts")
    ).first()

    # bucket = count of cuts strictly below the proxy, found by binary
    # search: cut_vals[m] separates bucket m from m+1, so proxy >
    # cut_vals[m] means the bucket is in (m, hi]
    def tree(lo: int, hi: int) -> F.Column:
        if lo == hi:
            return F.lit(lo).cast("bigint")
        mid = (lo + hi) // 2
        return F.when(
            F.col("__proxy") > F.lit(int(cut_vals[mid])), tree(mid + 1, hi)
        ).otherwise(tree(lo, mid))

    return (
        p.withColumn("__bucket", tree(0, len(cut_vals)))
        .drop("__proxy")
    )


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

    Ids may be numeric (floor-division buckets, zero extra passes) or
    strings (one extra quantile pass for order-preserving range
    buckets -- see :func:`_order_preserving_bucket`).
    """
    d = _order_preserving_bucket(
        df.select(
            F.col(id_col),
            token_count(text_col).alias("n_tokens"),
        ),
        id_col,
        bucket_size,
    )
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


# ---------------------------------------------------------------------------
# histogram packing (whole-document bins, no cross-contamination)
# ---------------------------------------------------------------------------


def _spfhp_solve(
    hist: dict[int, int], seq_len: int, max_patterns: int = 50_000
) -> list[tuple[tuple[int, ...], int]]:
    """Shortest-pack-first histogram packing on the LENGTH HISTOGRAM.

    Re-implements the published SPFHP idea (Krell et al., "Efficient
    Sequence Packing without Cross-contamination", 2021): because the
    solver sees only the histogram (<= seq_len rows, independent of
    corpus size), packing a 100 TB corpus costs the same driver-side
    milliseconds as packing 10k docs.  Greedy, longest lengths first;
    each doc joins the OPEN pattern with the smallest remaining
    capacity that still fits (ties broken by canonical pattern order
    for determinism), else opens a new bin.

    Returns ``[(pattern, count), ...]`` -- pattern = tuple of doc
    lengths in CONSUMPTION order (descending), count = how many bins
    use it -- in a deterministic canonical order.  ``max_patterns``
    caps state: past it, the fullest open patterns are finalized
    (closed) before new ones open, degrading packing quality, never
    correctness.
    """
    open_pats: dict[tuple[int, ...], int] = {}
    closed: dict[tuple[int, ...], int] = {}
    for length in sorted(hist, reverse=True):
        c = int(hist[length])
        if c <= 0:
            continue
        if length > seq_len:
            raise ValueError(f"length {length} > seq_len {seq_len}")
        while c > 0:
            fits = [
                p for p in open_pats
                if open_pats[p] > 0 and seq_len - sum(p) >= length
            ]
            if fits:
                # shortest-pack-first: least remaining capacity wins
                best = min(fits, key=lambda p: (seq_len - sum(p), p))
                k = min(c, open_pats[best])
                open_pats[best] -= k
                if open_pats[best] == 0:
                    del open_pats[best]
                grown = best + (length,)
                open_pats[grown] = open_pats.get(grown, 0) + k
                c -= k
            else:
                open_pats[(length,)] = open_pats.get((length,), 0) + c
                c = 0
            if len(open_pats) > max_patterns:
                fullest = sorted(
                    open_pats, key=lambda p: (seq_len - sum(p), p)
                )[: len(open_pats) // 2]
                for p in fullest:
                    closed[p] = closed.get(p, 0) + open_pats.pop(p)
    for p, n in open_pats.items():
        closed[p] = closed.get(p, 0) + n
    _merge_patterns(closed, seq_len)
    return sorted(closed.items())


def _merge_patterns(closed: dict[tuple[int, ...], int], seq_len: int) -> None:
    """Post-pass: combine whole bins whose contents fit together.

    The SPF greedy is brittle near granularity boundaries -- two
    histograms of near-identical shape can land at 2% vs 14% padding
    when a pattern run misaligns and a tail of small-length bins stays
    underfull.  Merging operates on PATTERN CLASSES (not individual
    bins), so each step retires min(count) bins at once: repeatedly
    give the emptiest pattern the fullest partner that still fits.
    Strictly decreases bin count, terminates, and stays O(P^2) per
    merge on the (tiny) pattern inventory.  In place.  Guard: a
    pathological inventory (adversarial length mixes can reach the
    ``max_patterns`` cap) would make the quadratic scan the bottleneck,
    so past 2000 patterns the pass is skipped -- packing quality
    degrades toward plain SPFHP, correctness never.
    """
    if len(closed) > 2000:
        return
    while True:
        pats = sorted(closed.items(), key=lambda kv: (sum(kv[0]), kv[0]))
        merged = False
        for p, c in pats:
            if closed.get(p, 0) <= 0:
                continue
            rem = seq_len - sum(p)
            best = None
            for q, cq in pats:
                if closed.get(q, 0) <= 0 or sum(q) > rem:
                    continue
                if q == p and closed[p] < 2:
                    continue
                if best is None or sum(q) > sum(best):
                    best = q
            if best is None:
                continue
            k = closed[p] // 2 if best == p else min(closed[p], closed[best])
            if k <= 0:
                continue
            closed[p] -= k
            closed[best] -= k
            comb = tuple(sorted(p + best, reverse=True))
            closed[comb] = closed.get(comb, 0) + k
            for key in {p, best}:
                if closed.get(key) == 0:
                    del closed[key]
            merged = True
            break
        if not merged:
            return


def histogram_pack(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 2048,
    bucket_size: int = 100_000,
    n_tokens_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """Whole-document bin packing: every doc lands in exactly one
    ``seq_len``-capacity bin, bins never split a document -- the
    packing used when cross-document attention contamination must be
    avoided (vs :func:`sequence_pack_offsets`' concat-and-split
    stream).  Docs longer than ``seq_len`` are clamped (``truncated``
    flag); empty docs are excluded.

    Returns ``(assignment_df, stats)``: one row per doc --
    ``(doc_id, n_tokens, bin_id, truncated)`` with bin token sums
    <= seq_len -- plus driver-side exact ``stats``
    (``n_docs, n_bins, total_tokens, padding_frac, n_truncated,
    n_patterns``) computed from the histogram, no second corpus pass.

    Scale shape: ONE corpus pass builds the <= seq_len-row length
    histogram (map-side combined); the SPFHP solve runs on the driver
    against that histogram (corpus-size independent); assignment is
    pure arithmetic -- each doc's RANK within its length class maps to
    (pattern block, instance, slot) through a broadcast segment table.
    The rank itself uses the module's two-phase trick keyed on
    (length, id-bucket) -- the bucket is ``xxhash64(id) %
    ceil(n_docs / bucket_size)``, so it accepts ANY id type and keeps
    mean window-partition occupancy at ``bucket_size`` rows; a
    billion-doc length class never funnels through one task.
    Shuffle inventory: the (id, length, bucket)
    triple through one exchange for the local rank window, a
    histogram-sized aggregate, two broadcasts back.  Document text
    never moves.

    Sizing ``bucket_size``: the rank-base broadcast holds one row per
    NON-EMPTY (length, bucket) pair -- up to ``seq_len * n_docs /
    bucket_size`` rows -- so scale ``bucket_size`` with the corpus
    (e.g. 1e8 at 1e11 docs keeps the broadcast at ~2M rows) rather
    than leaving the 1e5 default; the window partitions grow to
    ``bucket_size / seq_len`` rows per (length, bucket) on average,
    which a task absorbs easily at any sane setting.

    ``n_tokens_col``: name of a PRECOMPUTED whitespace-token-count
    column to use instead of re-tokenizing ``text_col`` -- callers that
    already tokenized (e.g. to pre-filter oversized docs for the
    byte-exact materializer) pass it so the corpus is tokenized once,
    not twice.  The caller owns the equivalence to
    ``token_count(text_col)``.
    """
    # cast to bigint: token_count casts its F.size to bigint, and the
    # assignment frame's n_tokens dtype must not depend on which path
    # produced it (it feeds dtype-compared registered queries)
    raw = (
        F.col(n_tokens_col).cast("bigint")
        if n_tokens_col is not None
        else token_count(text_col)
    )
    d = (
        df.select(
            F.col(id_col),
            raw.alias("__raw_tokens"),
        )
        .filter(F.col("__raw_tokens") > 0)
        .select(
            id_col,
            F.least(F.col("__raw_tokens"), F.lit(seq_len)).alias("n_tokens"),
            (F.col("__raw_tokens") > seq_len).alias("truncated"),
        )
    )
    # the narrow (id, len, flag, bucket) frame feeds the histogram AND
    # the rank path: materialize lazily or the text scan runs twice
    # (multi-reference plans recompute; ~20 bytes/row, linear storage)
    d = d.localCheckpoint(eager=False)

    hist_rows = (
        d.groupBy("n_tokens", "truncated").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    hist: dict[int, int] = {}
    n_truncated = 0
    for r in hist_rows:
        hist[int(r.n_tokens)] = hist.get(int(r.n_tokens), 0) + int(r.c)
        if r.truncated:
            n_truncated += int(r.c)
    if not hist:
        spark = df.sparkSession
        id_type = df.schema[id_col].dataType.simpleString()
        empty = spark.createDataFrame(
            [],
            f"{id_col} {id_type}, n_tokens bigint, bin_id bigint, "
            "truncated boolean",
        )
        return empty, {
            "n_docs": 0, "n_bins": 0, "total_tokens": 0,
            "padding_frac": 0.0, "n_truncated": 0, "n_patterns": 0,
        }

    # bucket ids by HASH, not floor(id / bucket_size): hashing needs no
    # numeric-id assumption (string ids raise CAST_INVALID_INPUT under
    # ANSI, or NULL-bucket away every row with ANSI off) and spreads
    # arbitrary key distributions evenly; the histogram collect above
    # already fixed n_docs, so the bucket count lands mean occupancy at
    # bucket_size without a second pass
    n_docs = sum(hist.values())
    n_buckets = max(1, -(-n_docs // bucket_size))
    d = d.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )

    patterns = _spfhp_solve(hist, seq_len)

    # segment table: for each length, the consumption ranges in pattern
    # order -- (length, rank_start, n_per_inst, m_instances, bin_base)
    seg_rows = []
    next_rank: dict[int, int] = {length: 0 for length in hist}
    bin_base = 0
    for pat_id, (pat, m) in enumerate(patterns):
        per_len: dict[int, int] = {}
        for length in pat:
            per_len[length] = per_len.get(length, 0) + 1
        for length, n_per in sorted(per_len.items()):
            start = next_rank[length]
            seg_rows.append((length, start, n_per, m, bin_base, pat_id))
            next_rank[length] = start + n_per * m
        bin_base += m
    spark = df.sparkSession
    segs = spark.createDataFrame(
        seg_rows,
        "n_tokens bigint, rank_start bigint, n_per_inst int, "
        "m_inst bigint, bin_base bigint, pattern_id int",
    )

    # two-phase rank within each length class, (length, bucket)-keyed so
    # no single window partition outgrows bucket_size
    wloc = Window.partitionBy("n_tokens", "__bucket").orderBy(F.col(id_col).asc())
    local = d.withColumn("__local_rank", F.row_number().over(wloc))
    per_lb = d.groupBy("n_tokens", "__bucket").agg(
        F.count(F.lit(1)).alias("__lbc")
    )
    wb = (
        Window.partitionBy("n_tokens")
        .orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = per_lb.withColumn(
        "__lbase", F.sum("__lbc").over(wb) - F.col("__lbc")
    ).select("n_tokens", "__bucket", "__lbase")
    ranked = local.join(F.broadcast(bases), ["n_tokens", "__bucket"]).withColumn(
        "__rank", F.col("__lbase") + F.col("__local_rank") - 1
    )

    assigned = (
        ranked.join(F.broadcast(segs), "n_tokens")
        .filter(
            (F.col("__rank") >= F.col("rank_start"))
            & (F.col("__rank") < F.col("rank_start")
               + F.col("n_per_inst").cast("bigint") * F.col("m_inst"))
        )
        .select(
            id_col,
            "n_tokens",
            (
                F.col("bin_base")
                + F.floor(
                    (F.col("__rank") - F.col("rank_start")) / F.col("n_per_inst")
                )
            ).cast("bigint").alias("bin_id"),
            "truncated",
        )
    )

    total_tokens = sum(k * v for k, v in hist.items())
    n_bins = sum(m for _, m in patterns)
    stats = {
        "n_docs": int(n_docs),
        "n_bins": int(n_bins),
        "total_tokens": int(total_tokens),
        "padding_frac": round(1.0 - total_tokens / (n_bins * seq_len), 6),
        "n_truncated": int(n_truncated),
        "n_patterns": len(patterns),
    }
    return assigned, stats


def pack_bins_text(
    df: DataFrame,
    assignment: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Materialize :func:`histogram_pack` bins as training rows: one row
    per bin -- ``(bin_id, n_docs, n_tokens, packed_text)`` -- with the
    bin's documents concatenated in deterministic (id) order,
    truncated members clipped to their packed token budget.

    Scale shape: broadcast-join nothing -- the assignment frame is
    corpus-sized, so this is one equi-join on the id (both sides hash
    on the same key) followed by ONE bin-keyed shuffle that carries
    each document's text exactly once (the unavoidable data movement:
    bins must be assembled somewhere), with map-side nothing to
    combine.  ``sort_array`` over the collected (id, text) structs
    keeps assembly order deterministic regardless of arrival order.
    """
    joined = df.select(F.col(id_col), F.col(text_col)).join(
        assignment.select(id_col, "n_tokens", "bin_id"), id_col
    )
    clipped = joined.select(
        "bin_id",
        "n_tokens",
        F.struct(
            F.col(id_col).alias("id"),
            F.concat_ws(
                sep, F.slice(tokens(text_col), 1, F.col("n_tokens").cast("int"))
            ).alias("t"),
        ).alias("__member"),
    )
    return (
        clipped.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.concat_ws(
                sep, F.transform(F.sort_array(F.collect_list("__member")), lambda m: m["t"])
            ).alias("packed_text"),
        )
    )


def pack_bins_exact(
    df: DataFrame,
    assignment: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize :func:`histogram_pack` bins with texts preserved
    BYTE-EXACTLY: one row per bin -- ``(bin_id, n_docs, n_tokens,
    packed_text, char_bases)`` -- members concatenated in id order with
    NO separator and NO re-tokenization, plus each member's character
    offset into the packed string as an array of ``(id, char_base)``
    structs.

    This is the materializer for texts whose internal layout carries
    meaning -- rendered SFT conversations address their loss-mask spans
    by character against the exact rendered string
    (``chat.conversation_turns``), which
    :func:`pack_bins_text`'s whitespace-normalizing token clip would
    destroy.  A downstream trainer re-bases each member's spans by its
    ``char_base`` (property: ``substring(packed_text, char_base +
    member-relative span)`` recovers the original slice --
    ``tests/test_packing.py``).

    Because exact texts cannot be clipped without corrupting their
    spans, any ``truncated`` member in the assignment raises: pick
    ``seq_len`` above the longest document (or pre-filter) before
    packing span-addressed corpora.

    Scale shape: identical to :func:`pack_bins_text` -- one id-keyed
    equi-join, then ONE bin-keyed shuffle carrying each text exactly
    once; char bases are intra-row arithmetic over the sorted member
    array (the ``chat.conversation_turns`` slice-sum idiom -- O(m^2)
    in the bin's MEMBER count over ``length()`` integers, and a bin
    holds at most ``seq_len`` tokens' worth of members).  The id keeps
    its original type in ``char_bases``.
    """
    joined = df.select(F.col(id_col), F.col(text_col)).join(
        assignment.select(id_col, "n_tokens", "bin_id", "truncated"), id_col
    )
    # one validation action covers both corruption modes: truncation
    # (clipping would corrupt character addressing) and NULL text (a
    # NULL member would be SKIPPED by concat_ws while NULL-poisoning
    # every later member's char_base -- silent offset corruption)
    bad = joined.agg(
        F.sum(F.col("truncated").cast("int")).alias("__nt"),
        F.sum(F.col(text_col).isNull().cast("int")).alias("__nn"),
    ).first()
    if bad["__nt"]:
        raise ValueError(
            f"pack_bins_exact: {bad['__nt']} truncated member(s) -- exact "
            "texts cannot be clipped without corrupting their character "
            "addressing; raise seq_len above the longest document or "
            "pre-filter before packing"
        )
    if bad["__nn"]:
        raise ValueError(
            f"pack_bins_exact: {bad['__nn']} NULL text member(s) -- a "
            "NULL member has no byte-exact representation (concat would "
            "drop it while poisoning later char_bases); drop or "
            "coalesce NULL texts before packing"
        )
    members = (
        joined.select(
            "bin_id",
            "n_tokens",
            F.struct(
                F.col(id_col).alias("id"), F.col(text_col).alias("t")
            ).alias("__member"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sort_array(F.collect_list("__member")).alias("__ms"),
        )
    )
    ms = F.col("__ms")
    bases = F.transform(
        ms,
        lambda m, i: F.struct(
            m["id"].alias("id"),
            F.aggregate(
                F.slice(ms, F.lit(1), i),
                F.lit(0).cast("bigint"),
                lambda acc, p: acc + F.length(p["t"]).cast("bigint"),
            ).alias("char_base"),
        ),
    )
    return members.select(
        "bin_id",
        "n_docs",
        "n_tokens",
        F.concat_ws("", F.transform("__ms", lambda m: m["t"])).alias(
            "packed_text"
        ),
        bases.alias("char_bases"),
    )
