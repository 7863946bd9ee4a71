"""Corpus-curation operators for large-scale training-data pipelines.

Engine extensions beyond the reference surface (the reference's Flink
topology — ``Main.java`` — has no corpus tooling; these are the standard
pre-training curation steps a 100 TB documents pipeline needs next to the
dedup family in :mod:`.dedup`):

- :func:`pii_redact` — regex scrubbing of emails / phones / IPv4s / SSNs,
  with per-category match counts (the audit trail curation jobs keep).
- :func:`repetition_stats` — Gopher-style repetition signals at the word
  level (duplicate-token fraction, most-frequent-bigram share); documents
  dominated by repeated n-grams are the classic low-quality strata cut
  before training.
- :func:`ngram_contamination` — benchmark-contamination check: flag
  training documents sharing word n-grams with a held-out eval set (the
  GPT-3/PaLM 13-gram-overlap decontamination procedure, n configurable).

Everything stays JVM-side (``pyspark.sql.functions`` expressions, no
Python in the hot path) and every pattern is written to behave
identically under Java regex (Spark) and RE2 (DuckDB): character
classes, ``\\b`` anchors and bounded quantifiers only — no lookaround,
no backreferences — so the DuckDB oracle verifies results byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rounding import round_parity

from .text import tokens

# PII patterns, applied in dict order.  Deliberately conservative shapes
# (dash-separated phones, dotted quads) so no pattern can match inside
# another's redacted span and Java-regex / RE2 agree on every match:
# each is anchored with \b and uses only classes + bounded repeats.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Redact PII spans and count matches per category.

    Adds ``out_col`` (text with every match replaced by its placeholder)
    plus one ``n_<category>`` count column per :data:`PII_PATTERNS` entry.
    Counts are taken on the ORIGINAL text, then replacements chain in
    dict order — the patterns are mutually non-overlapping by
    construction (SSN is 3-2-4 digits, phone 3-3-4; emails consume their
    digits before any numeric pattern could), so order only matters for
    determinism, not results.

    Scale shape: a single narrow projection — four ``regexp_count`` and
    four ``regexp_replace`` calls fused into one whole-stage-codegen'd
    map over the scan.  ZERO shuffle at any corpus size; redaction cost
    is linear in bytes scanned and embarrassingly parallel.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    red = c
    for pat, repl in PII_PATTERNS.values():
        red = F.regexp_replace(red, pat, repl)
    return df.select("*", *counts, red.alias(out_col))


def _toks(text_col: str) -> Column:
    return tokens(text_col)


def word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a MATERIALIZED token
    column (empty when < n tokens).

    Takes tokens, not text, on purpose: this expression references its
    input ~n+2 times -- handing it the raw ``split(...)`` expression
    would re-tokenize the document at every reference after Catalyst
    inlines the projection (the same expression-duplication trap
    ``text.py:language_id`` documents).  Callers materialize tokens with
    one ``select``/``withColumn`` and pass the column reference.

    Construction is n-1 chained ``zip_with`` passes over n shifted
    slices of the token array -- n array allocations per DOCUMENT and
    one flat ``concat`` per gram.  The obvious alternatives evaluate an
    interpreted lambda with per-GRAM allocations and measure 3-10x
    slower on the sf0.1 corpus (``transform`` + ``slice`` +
    ``concat_ws``: 4.1 s; ``transform`` + n ``element_at``: 13.3 s;
    this shape: 1.4 s for bigrams -- higher-order-function lambdas are
    outside whole-stage codegen, so per-element work dominates).
    """
    # clamp for short docs: slice/zip_with reject negative lengths, and
    # branch-evaluation guards are an implementation detail not worth
    # relying on
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style word-level repetition signals, one row per doc:

    - ``n_tokens`` / ``n_unique_tokens`` and ``dup_token_frac`` =
      1 - unique/total (0.0 for empty docs), rounded to 6;
    - ``top_bigram`` — the most frequent word bigram (ties break to the
      lexicographically smallest, so engine and oracle agree), with
      ``top_bigram_count`` and ``top_bigram_frac`` = count / n_bigrams.

    Documents whose mass concentrates in few n-grams (high
    ``top_bigram_frac``) or few distinct tokens (high
    ``dup_token_frac``) are the repetition strata the Gopher quality
    filters drop (Rae et al. 2021 §A1.1 line/paragraph analogue — this
    corpus is single-line word text, so the signal lives at word level).

    Scale shape: token stats are a per-row projection (zero shuffle).
    The bigram mode needs cross-row state per doc only — explode to
    (doc, bigram), two-level aggregate with a map-side partial
    (``groupBy(doc, bigram)``), then a ``max_by`` per doc: one shuffle
    keyed on the doc id, never on the corpus-wide bigram vocabulary, so
    hot bigrams ("the the ...") cannot skew a reduce key.
    """
    tokenized = df.select(F.col(id_col), _toks(text_col).alias("__toks"))
    per_row = tokenized.select(
        F.col(id_col),
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("bigint").alias("n_unique_tokens"),
    )
    dup_frac = F.when(
        F.col("n_tokens") > 0,
        round_parity(1.0 - F.col("n_unique_tokens") / F.col("n_tokens"), 6),
    ).otherwise(F.lit(0.0))
    # bigrams built straight off the tokenized frame (NOT carried through
    # per_row: per_row feeds the final join too, and a shared child would
    # re-run the gram build once per consumer)
    bigram_counts = (
        tokenized.select(
            id_col, F.explode(word_ngrams(F.col("__toks"), 2)).alias("bigram")
        )
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # max count wins; ties break to the smallest bigram string.  max_by
    # with a (cnt, reversed-string) struct would need a total order on
    # strings' reverse — use min_by on (-cnt, bigram) instead: the
    # lexicographic struct order is exactly (highest count, smallest
    # bigram).
    top = bigram_counts.groupBy(id_col).agg(
        F.min_by(
            F.struct(F.col("bigram"), F.col("cnt")),
            F.struct((-F.col("cnt")).alias("neg"), F.col("bigram")),
        ).alias("__top"),
        F.sum("cnt").alias("__n_bigrams"),
    )
    return (
        per_row.join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "n_unique_tokens",
            dup_frac.alias("dup_token_frac"),
            F.col("__top.bigram").alias("top_bigram"),
            F.coalesce(F.col("__top.cnt"), F.lit(0)).cast("bigint").alias(
                "top_bigram_count"
            ),
            F.when(
                F.col("__n_bigrams") > 0,
                round_parity(F.col("__top.cnt") / F.col("__n_bigrams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check (GPT-3 appendix-C style): for every
    corpus document, count its DISTINCT word ``n``-grams that also occur
    anywhere in the ``benchmark`` frame, and flag ``contaminated`` when
    any overlap exists.  One row per corpus doc:
    ``(doc_id, n_ngrams, n_overlap, overlap_frac, contaminated)``.

    GPT-3 used 13-gram overlap; ``n`` is a knob because the right value
    scales with how paraphrase-robust the check must be (smaller n =
    stricter).

    Scale shape: the benchmark side is an eval set — thousands of docs,
    not billions — so its distinct n-gram set is broadcast and the 100 TB
    corpus is NEVER shuffled by the membership test: explode distinct
    grams per doc (map-side), hash-join against the broadcast set, and
    aggregate back on the doc id (map-side partial first).  The only
    shuffle is the per-doc count combine, sized by matching grams, not
    the corpus.
    """
    def _grams(df: DataFrame) -> DataFrame:
        tok = df.select(F.col(id_col), _toks(text_col).alias("__toks"))
        return tok.select(
            F.col(id_col),
            F.array_distinct(word_ngrams(F.col("__toks"), n)).alias("__grams"),
        )

    c = _grams(corpus)
    bench_set = (
        _grams(benchmark).select(F.explode("__grams").alias("gram")).distinct()
    )
    exploded = c.select(id_col, F.explode("__grams").alias("gram"))
    hits = (
        exploded.join(F.broadcast(bench_set), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        c.select(F.col(id_col), F.size("__grams").cast("bigint").alias("n_ngrams"))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            "n_ngrams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
            F.when(
                F.col("n_ngrams") > 0,
                round_parity(
                    F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("n_ngrams"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("overlap_frac"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_tokens: int = 90,
    min_mean_word_len: float = 4.0,
    max_mean_word_len: float = 5.0,
    min_alpha_frac: float = 0.9,
    max_top_token_frac: float = 0.1,
    required_words: tuple[str, ...] = ("the", "a", "data"),
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, table A1)
    restricted to the word-level subset that applies to a corpus without
    line structure: token-count bounds, mean-word-length band,
    alphabetic-word fraction, most-common-token fraction, and a
    required-word presence check.  Emits the measured signals, one
    boolean per rule, and the conjunctive ``keep``.

    All signals are single-pass array expressions over the row's own
    token array -- zero shuffle at any scale, exactly like the other
    row-local curation gates, so the filter composes into
    ``curation_pipeline``-style recipes for free.  The most-common-token
    scan is O(tokens x distinct) per row, which is quadratic on a
    pathological multi-million-token document, so it only RUNS for docs
    up to ``4 * max_tokens`` (the rule flag is the lazily-evaluated
    branch of a CASE); longer docs -- which already fail the
    token-count rule -- report ``top_token_frac = NULL`` and
    ``ok_top_token = false``.  Rule flags evaluate on RAW ratios
    (bit-identical integer-division doubles in both engines); the
    emitted copies are rounded for display only.
    """
    toks = _toks(text_col)
    d = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    # NULL-when-zero denominator: a zero-token doc's ratios are NULL in
    # DuckDB (x/0 -> NULL) but a job-killing DIVIDE_BY_ZERO under Spark
    # ANSI; dividing by NULL instead yields NULL in both engines while
    # keeping the n > 0 arithmetic bit-identical (degenerate-corpus sweep)
    nz = F.when(n != 0, n)
    mean_wl = F.aggregate(
        F.col("__toks"), F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    ) / nz
    alpha_frac = (
        F.size(F.filter(F.col("__toks"), lambda w: w.rlike(r"^[A-Za-z]+$"))) / nz
    )
    guard = 4 * max_tokens
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("__toks"),
            lambda t: F.size(F.filter(F.col("__toks"), lambda w: w == t)),
        )
    )
    top_frac = F.when(n <= guard, top_cnt / nz).otherwise(F.lit(None))
    req = [F.lit(w) for w in required_words]
    has_required = F.size(
        F.filter(F.array(*req), lambda w: F.array_contains(F.col("__toks"), w))
    ) >= 1
    ok_len = (n >= min_tokens) & (n <= max_tokens)
    ok_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_alpha = alpha_frac >= min_alpha_frac
    # coalesce: a zero-token doc has top_frac NULL (0/0); the flag must
    # be false, not NULL, to match the oracle's coalesce(..., false)
    ok_top = F.when(
        n <= guard, F.coalesce(top_frac <= max_top_token_frac, F.lit(False))
    ).otherwise(F.lit(False))
    return d.select(
        id_col,
        n.cast("bigint").alias("n_tokens"),
        round_parity(mean_wl, 4).alias("mean_word_len"),
        round_parity(alpha_frac, 4).alias("alpha_frac"),
        round_parity(top_frac, 4).alias("top_token_frac"),
        ok_len.alias("ok_token_count"),
        ok_wl.alias("ok_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_top.alias("ok_top_token"),
        has_required.alias("ok_required_word"),
        (ok_len & ok_wl & ok_alpha & ok_top & has_required).alias("keep"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio -- the classic cheap
    redundancy signal (Gopher/CCNet lineage): highly compressible text
    (ratio far below typical prose ~0.4-0.6) is repetitive or
    templated; ratios near 1 are high-entropy noise (base64 blobs,
    minified junk).  Complements :func:`repetition_stats` (which counts
    EXACT n-gram repeats) with a model-free whole-document measure.

    Output: ``(id, n_bytes, n_compressed, compression_ratio)`` --
    ratio = compressed/raw utf-8 bytes, rounded 1e-6; empty docs get
    ratio 1.0 (no evidence either way).

    Scale shape: ``mapInPandas`` over Arrow batches -- zlib is
    C-speed, stdlib, per-row independent; zero shuffle, linear in
    bytes, inherits scan partitioning.  (A pure-expression spelling
    does not exist: Spark has no SQL compress(); this is the honest
    Python-boundary shape, same contract as the multimodal codecs.)
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    out_schema = (
        f"{id_col} long, n_bytes bigint, n_compressed bigint, "
        "compression_ratio double"
    )

    def _gen(batches):
        import zlib

        import pandas as _pd

        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf[text_col]
            ]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, level)) if b else 0 for b in raw]
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "compression_ratio": [
                        round(c / b, 6) if b else 1.0 for c, b in zip(nc, nb)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_gen, out_schema)
