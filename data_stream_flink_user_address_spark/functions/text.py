"""Text-analysis column functions for large-scale training-data pipelines.

Engine extension beyond the reference surface (BASELINE.json north star):
language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace split), document
fingerprinting (md5 content hash + positional sampling).

Everything here is built from ``pyspark.sql.functions`` expressions --
JVM-side, whole-stage-codegen'd, no Python in the hot path -- and each has
an exact ANSI-SQL equivalent so the DuckDB oracle can verify it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic stopword sets for the language-ID heuristic.  Scoring is
# hits-per-language with a fixed priority order for ties.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
    "zh": ["de", "shi", "bu", "le", "zai", "ren", "you", "wo"],
}

# BPE merge loop goes driver-side when the distinct-word vocabulary
# fits this many rows (~100 B/word -> <=10 MB collected): one Spark job
# instead of one argmax job per merge round.  Above it the distributed
# round loop runs unchanged (the dedup_clusters hybrid threshold idiom).
_BPE_DRIVER_VOCAB = 65536

_QUALITY_PUNCT = ".,!?;:"

# ASCII case map for locale-independent lowering (see lower_ascii)
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def lower_ascii(col: Column | str) -> Column:
    """ASCII-only lowercasing for FINGERPRINT/FEATURE purposes.

    Full Unicode case mapping is ENGINE-SPECIFIC: Java (Spark) lowers
    U+0130 'İ' to 'i' + U+0307 (two code points, SpecialCasing.txt),
    while utf8proc (DuckDB) and simple-mapping ICU modes give plain
    'i' -- so the same corpus hashed on two engines mints different
    features/fingerprints, exactly what a persisted cross-engine store
    contract must avoid (found by the r18 unicode parity sweep on
    nb_quality_scores: ONE 'İ' in the corpus shifted every doc's
    global NB score).  The portable spelling lowers [A-Z] only and
    leaves everything else byte-stable; identical on both engines (and
    identical to full lower() on ASCII text).  Same stance as
    BPE_SPLIT_PATTERN: ASCII classes only, so Java and RE2/utf8proc
    agree.  Oracle twin: ``translate(col, 'A..Z', 'a..z')``.

    Use for hashing/deduplication/feature extraction.  For DISPLAY
    lowering (no cross-engine replay), plain ``F.lower`` remains fine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _ASCII_UPPER, _ASCII_LOWER)


# DuckDB-compatible per-row double rounding (binary value, not
# shortest-decimal-repr) -- see functions/rounding.py for the full
# divergence-class writeup; re-exported here because the r18 fix
# landed on quality_score first and callers import it from text
from .rounding import round_parity  # noqa: F401,E402


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array, NULL
    stays NULL.  Empty tokens are DROPPED after the split: the old
    ``split(trim(text), '\\s+')`` spelling left a phantom '' token when
    text starts/ends with non-space whitespace, because Spark's (and
    DuckDB's) ``trim`` strips only 0x20 -- so every newline-terminated
    document (most real documents) counted one token too many (r17;
    caught by the substring-dedup property fuzz).  The oracle twin is
    ``_sql_tokens()`` in ``__spark_entry__.py`` -- the two flip
    together.

    Spelled ``array_remove(split(...), '')`` rather than the
    higher-order ``filter(split(...), t -> t != '')`` (r19, the
    two-round-open VERDICT watch item): both drop exactly the ''
    elements (split never yields NULL elements; verified 0 differing
    rows over the sf0.1 corpus), but array_remove is a flat codegen
    expression while the lambda filter evaluates interpreted per
    element -- measured 1.4-1.6x on the isolated tokenize+explode pass
    (same-session interleaved A/B, tokens() guide section 4)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(c, r"\s+"), "")


def norm_ws(text: Column | str) -> Column:
    """Whitespace normalization for fingerprint/shingle inputs:
    collapse runs to single spaces and strip ALL edge whitespace;
    NULL -> NULL, blank -> ''.
    The old ``regexp_replace(trim(x), '\\s+', ' ')`` spelling kept a
    trailing space when text ends in non-space whitespace, so ``'doc'``
    and ``'doc\\n'`` minted DIFFERENT exact-dedup fingerprints and
    shingle sets -- a newline-variant duplicate survived every dedup
    pass (r17, the tokens() fix's sibling).  Collapsing FIRST turns
    every edge character into a plain space, which trim then strips --
    one regexp + trim, no per-row token array (the ``_collapse_ws``
    spelling, reused).  Oracle twin: ``_sql_norm()`` in
    ``__spark_entry__.py``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def _hits(toks: Column, words: list[str]) -> Column:
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(__toks, t -> t IN ({in_list})))")


def language_id(text: Column | str, alias_tokens: str = "__toks") -> Column:
    """Argmax of stopword hits across STOPWORDS; 'und' (undetermined) when
    zero hits everywhere.  Ties resolve in dict order (en > es > ...):
    the first language whose hit count equals the maximum wins --
    deterministic, SQL-expressible (same ``greatest`` + first-match CASE
    the oracle uses).

    Use via ``df.withColumn("__toks", tokens("text")).withColumn("lang_pred",
    language_id("text"))``; the helper reads the pre-computed ``__toks``
    column so the tokenization is done once.

    Structure note: an earlier version chained strictly-greater ``when``
    updates, which nests each hit-count expression inside every later
    branch -- exponential duplication of the (interpreted, higher-order)
    filter calls.  The greatest-based CASE keeps each hit count to a
    constant number of appearances.
    """
    langs = list(STOPWORDS)
    hit_cols = {lang: _hits(F.col(alias_tokens), STOPWORDS[lang]) for lang in langs}
    g = F.greatest(*[hit_cols[lang] for lang in langs])
    case = F.when(g == 0, F.lit("und"))
    for lang in langs:  # first language reaching the max wins
        case = case.when(hit_cols[lang] == g, F.lit(lang))
    return case


def punct_count(text: Column | str) -> Column:
    """Occurrences of the fixed punctuation set ``.,!?;:`` (identical
    character class on the SQL side)."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))).cast("bigint")


def quality_score(text: Column | str, alias_tokens: str = "__toks") -> Column:
    """Deterministic [0,1] quality heuristic:

      0.25 * min(1, n_tokens/64)            (enough content)
    + 0.25 * min(1, mean_token_len/8)       (not degenerate tokens)
    + 0.25 * (1 - min(1, punct_ratio*10))   (not punctuation soup)
    + 0.25 * min(1, stopword_ratio*4)       (natural-language-like)

    rounded to 4 decimals so engine/oracle hashes agree -- via
    :func:`round_parity`, not ``F.round``, so a score landing within
    an ulp of a half boundary rounds the same way DuckDB rounds the
    identical double (r18 unicode sweep catch).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.col(alias_tokens)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    mean_tok_len = F.when(n_tok > 0, tok_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct_count(c).cast("double") / n_chars).otherwise(F.lit(0.0))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    in_list = ", ".join(f"'{w}'" for w in all_stop)
    stop_hits = F.expr(f"size(filter({alias_tokens}, t -> t IN ({in_list})))").cast("double")
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    score = (
        0.25 * F.least(F.lit(1.0), n_tok / 64.0)
        + 0.25 * F.least(F.lit(1.0), mean_tok_len / 8.0)
        + 0.25 * (1.0 - F.least(F.lit(1.0), punct_ratio * 10.0))
        + 0.25 * F.least(F.lit(1.0), stop_ratio * 4.0)
    )
    return round_parity(score, 4)


# BPE-ish pre-tokenizer: letter runs, digit runs, symbol runs -- the
# split a byte-pair-encoding tokenizer applies before merging.  ASCII
# classes only so the Java-regex (Spark) and RE2 (DuckDB) engines agree.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer split (vs the
    whitespace count of :func:`token_count`): 'don't stop!!' is 2
    whitespace tokens but 5 BPE-ish tokens (don / ' / t / stop / !!)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_SPLIT_PATTERN)).cast("bigint")


def winnow_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    character k-gram (rolling window), then keep the minimum hash of each
    w-long window of consecutive k-grams.  Near-identical documents share
    most selected hashes, and the selection is position-robust -- the
    standard rolling-hash fingerprint for plagiarism/near-dup detection.

    Output: one row per doc -- ``n_fp`` distinct selected hashes and
    ``fingerprint`` = md5 of the sorted hash list (a stable digest of the
    selection set).  Docs shorter than ``k + w - 1`` chars produce no row.

    Scale shape: winnowing is per-document, so it runs as pure per-row
    array expressions -- gram hashes, window minima, distinct+sort, and
    the digest all happen inside one projection.  ZERO shuffle at any
    scale (an earlier version exploded grams and ran an ordered window
    function: one doc_id shuffle + sort of n_docs x n_grams rows for a
    computation that never needed cross-row data).  md5-derived hashes
    keep it DuckDB-reproducible.
    """
    norm = norm_ws(text_col)
    d = df.select(F.col(id_col), norm.alias("__norm"))
    # need at least one full window of w consecutive k-grams
    d = d.filter(F.length("__norm") >= k + w - 1)
    gram_idx = F.sequence(F.lit(1), F.length("__norm") - (k - 1))
    hv_arr = F.transform(
        gram_idx,
        lambda i: F.conv(
            F.substring(F.md5(F.substr(F.col("__norm"), i, F.lit(k))), 1, 15), 16, 10
        ).cast("bigint"),
    )
    d = d.select(id_col, hv_arr.alias("__hv"))
    win_idx = F.sequence(F.lit(1), F.size("__hv") - (w - 1))
    sels = F.transform(win_idx, lambda j: F.array_min(F.slice("__hv", j, w)))
    sel_arr = F.array_sort(F.array_distinct(sels))
    return d.select(
        F.col(id_col),
        F.size(sel_arr).cast("bigint").alias("n_fp"),
        F.md5(
            F.concat_ws(",", F.transform(sel_arr, lambda x: x.cast("string")))
        ).alias("fingerprint"),
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized text.

    Collision-safe enough for dedup keys at trillions of docs; identical
    function exists in DuckDB so the oracle matches byte-for-byte.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(norm_ws(c))


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_limit: int = 65536,
    round_digits: int = 6,
) -> DataFrame:
    """Model-based quality proxy: per-doc mean negative log2 probability
    under the corpus' OWN unigram distribution (the CCNet/KenLM-filter
    shape with the simplest possible LM).  Low score = common, fluent
    tokens; high score = rare/junk-heavy text.  Output
    ``(doc_id, n_tokens, logprob_score)``.

    The "model" is the top-``vocab_limit`` tokens by frequency (ties to
    the lexicographically smaller token); out-of-vocabulary tokens score
    at p = 0.5/total -- strictly below the rarest in-vocab token, so OOV
    always costs more than any known token.

    Scale shape: the frequency pass is a token-keyed aggregate with
    map-side partial counts (shuffle = distinct tokens per partition,
    never token instances); the top-V cut is ``orderBy().limit()`` --
    Spark plans TakeOrderedAndProject, a per-partition partial top-V +
    merge, NOT a global sort; the model (<= vocab_limit rows) then
    BROADCASTS, so scoring each token is map-side and the only other
    shuffle is the doc-keyed partial-sum merge.  The corpus' text never
    crosses an exchange.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    top = freq.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(vocab_limit)
    total = freq.agg(F.sum("cnt").cast("double").alias("__tot"))
    scored = (
        toks.join(F.broadcast(top), "tok", "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__logp",
            -F.log2(
                F.coalesce(F.col("cnt").cast("double"), F.lit(0.5)) / F.col("__tot")
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__logp"), round_digits).alias("logprob_score"),
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Context-sensitive LM quality proxy (the CCNet/KenLM filter one
    order up from :func:`unigram_logprob_scores`): per-doc mean negative
    log2 of the Laplace-smoothed bigram conditional
    ``P(cur | prev) = (c(prev,cur) + alpha) / (c(prev,·) + alpha·V)``
    under the corpus' OWN bigram counts, ``V`` = corpus vocabulary
    size.  Scrambled or templated text that passes a unigram filter
    (common words, wrong order) scores high here.  Output
    ``(doc_id, n_bigrams, bigram_logprob)``; docs with fewer than two
    tokens have no bigrams and are omitted (nothing to score).

    Scale shape: adjacent pairs come from one ``lead()`` window
    partitioned by document -- the natural parallel unit, no global
    sort.  Counting then happens at TWO grains so token INSTANCES never
    ride a join shuffle: per-doc bigram multiplicities
    ``(doc, prev, cur, n)`` join the global bigram table on the bigram
    key (distinct-bigrams-per-doc rows, map-side combined), and the
    left-context totals ``c(prev,·)`` are a second aggregate OF the
    bigram table, not of the stream.  ``V`` broadcasts as a 1-row
    frame.  The per-doc score is the n-weighted mean, identical to
    averaging over instances.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        toks.withColumn("__nxt", F.lead("tok").over(w))
        .filter(F.col("__nxt").isNotNull())
        .groupBy(id_col, F.col("tok").alias("prev"), F.col("__nxt").alias("cur"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    c2 = pairs.groupBy("prev", "cur").agg(F.sum("__n").alias("__c2"))
    c1 = c2.groupBy("prev").agg(F.sum("__c2").alias("__c1"))
    vocab = toks.agg(F.countDistinct("tok").cast("double").alias("__v"))
    scored = (
        pairs.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__logp",
            -F.log2(
                (F.col("__c2").cast("double") + F.lit(float(alpha)))
                / (F.col("__c1").cast("double") + F.lit(float(alpha)) * F.col("__v"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__n").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("__n") * F.col("__logp")) / F.sum("__n"), round_digits
        ).alias("bigram_logprob"),
    )


def stupid_backoff_scores(
    df: DataFrame,
    ref_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_id_col: str | None = None,
    alpha: float = 0.4,
    round_digits: int = 6,
) -> DataFrame:
    """Stupid-backoff bigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation") -- the CCNet-style filter
    regime the unigram/bigram scorers approximate from below: train
    n-gram counts on a REFERENCE corpus (``ref_df``; defaults to
    ``df`` itself), score every document of ``df`` by its mean
    negative log2 token score under

        S(w_i | w_{i-1}) = c2(w_{i-1} w_i) / c1(w_{i-1})   if c2 > 0
                         = alpha * S(w_i)                   otherwise
        S(w)             = c(w) / T                         if c > 0
                         = 0.5 / T                          otherwise (OOV)

    with the first token of a document scored by the unigram term
    directly (no backoff penalty -- there is no context to back off
    from).  Unlike the Laplace bigram scorer, held-out text exercises
    the backoff path: unseen bigrams fall to the discounted unigram,
    unseen tokens to the OOV floor, so "fluent but off-domain" and
    "shuffled common words" separate cleanly.

    Output ``(id, n_tokens, n_bigram_hit, n_backoff, n_oov,
    lm_logprob)``: ``n_bigram_hit`` counts context-hit tokens,
    ``n_backoff`` the pos>0 tokens that fell to the unigram path,
    ``n_oov`` all tokens scored at the OOV floor (first-token OOVs
    included, so n_oov can overlap n_backoff); docs with no tokens
    have nothing to score and are omitted.

    Scale shape (the two-grain counting idiom of
    :func:`bigram_logprob_scores` / sampling.dsir_importance): the
    model is three aggregates OF the reference -- c2 from one
    doc-keyed lag window, c1 an aggregate of c2, (c, T) from the token
    stream -- and scoring joins per-doc (prev, cur) MULTIPLICITIES
    (distinct pairs per doc, map-side combined) against those tables
    on the bigram/unigram keys, so token instances never ride a join
    shuffle; the per-doc score is the n-weighted mean.  In the CCNet
    regime (reference = curated corpus ORDERS smaller than the scored
    crawl) the three model tables broadcast and scoring is map-side +
    one doc-keyed aggregate; self-trained on a 100 TB corpus the
    bigram join shuffles on bigram keys -- the standard distributed
    LM-scoring shape, and AQE picks the side.

    ``ref_id_col`` names the reference's id column when it differs
    from the scored frame's (only the per-document lag window needs
    it; defaults to ``id_col``).
    """
    ref = df if ref_df is None else ref_df
    rid = id_col if ref_id_col is None else ref_id_col

    rtoks = ref.select(F.explode(tokens(text_col)).alias("tok"))
    cu = rtoks.groupBy("tok").agg(F.count(F.lit(1)).alias("__cu"))
    # a token-free reference has no distribution to score under: fail
    # loudly at execution (sum over zero rows is NULL, which would
    # otherwise NULL/inf-poison every lm_logprob downstream).  The
    # guard is an expression, not an extra driver action -- scoring a
    # self-trained 100 TB corpus must not pay a second corpus scan.
    total = cu.agg(F.sum("__cu").cast("double").alias("__t")).select(
        F.when(F.col("__t") > 0, F.col("__t"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "stupid_backoff_scores: reference corpus has no "
                    "tokens -- nothing to train the LM on"
                )
            )
        )
        .alias("__t")
    )
    rpos = ref.select(
        F.col(rid).alias("__rid"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    rw = Window.partitionBy("__rid").orderBy("pos")
    c2 = (
        rpos.withColumn("__prev", F.lag("tok").over(rw))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev"), F.col("tok").alias("cur"))
        .agg(F.count(F.lit(1)).alias("__c2"))
    )
    c1 = c2.groupBy("prev").agg(F.sum("__c2").alias("__c1"))

    spos = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    sw = Window.partitionBy(id_col).orderBy("pos")
    inst = (
        spos.withColumn("__prev", F.lag("tok").over(sw))
        .groupBy(
            id_col, F.col("__prev").alias("prev"), F.col("tok").alias("cur")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    scored = (
        inst.join(c2, ["prev", "cur"], "left")
        .join(c1, "prev", "left")
        .join(cu.withColumnRenamed("tok", "cur"), "cur", "left")
        .crossJoin(F.broadcast(total))
    )
    uni_p = F.coalesce(F.col("__cu").cast("double"), F.lit(0.5)) / F.col("__t")
    s = (
        F.when(F.col("prev").isNull(), uni_p)
        .when(
            F.col("__c2").isNotNull(),
            F.col("__c2").cast("double") / F.col("__c1").cast("double"),
        )
        .otherwise(F.lit(float(alpha)) * uni_p)
    )
    scored = scored.withColumn("__logp", -F.log2(s))
    is_hit = F.col("prev").isNotNull() & F.col("__c2").isNotNull()
    is_backoff = F.col("prev").isNotNull() & F.col("__c2").isNull()
    return scored.groupBy(id_col).agg(
        F.sum("__n").cast("bigint").alias("n_tokens"),
        F.sum(F.when(is_hit, F.col("__n")).otherwise(0))
        .cast("bigint")
        .alias("n_bigram_hit"),
        F.sum(F.when(is_backoff, F.col("__n")).otherwise(0))
        .cast("bigint")
        .alias("n_backoff"),
        F.sum(F.when(F.col("__cu").isNull(), F.col("__n")).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.round(
            F.sum(F.col("__n") * F.col("__logp")) / F.sum("__n"), round_digits
        ).alias("lm_logprob"),
    )


# Fixed entity set for strip_markup: the handful that dominate web
# text.  Decoded AFTER tag removal, '&amp;' strictly LAST so that
# double-escaped text ('&amp;lt;') decodes one level per pass, never
# into a live '<'.
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _tags_to_spaces(col: Column) -> Column:
    """``<...>`` tags to single spaces -- THE tag regex, shared by
    :func:`strip_markup` and :func:`extract_main_content` so the two
    cannot drift."""
    return F.regexp_replace(col, r"<[^>]*>", " ")


def _collapse_ws(col: Column) -> Column:
    return norm_ws(col)


def strip_markup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """HTML/markup stripping -- the text-extraction step upstream of
    every quality/dedup stage when the corpus arrives as raw web pages:
    remove ``<...>`` tags (replaced by a space so ``a<br>b`` does not
    fuse into ``ab``), decode the dominant character entities
    (``&amp;`` last -- double-escaped text decodes one level, never
    into a live tag), and collapse the resulting whitespace runs.
    Output ``(id, text, n_tags, n_chars_removed)``; ``n_tags`` counts
    removed tags, ``n_chars_removed`` the net character shrinkage
    (markup + collapsed whitespace).

    Deliberately NOT an HTML parser: no tag nesting, no script/style
    content removal (a ``<script>`` body survives as text), no entity
    table beyond the fixed six.  That is the honest trade for a pure
    regex/replace pipeline that is row-local, deterministic, and
    oracle-checkable; real boilerplate removal belongs to
    :func:`..functions.dedup.boilerplate_line_dedup` downstream.

    Scale shape: zero shuffles -- every column is a per-row expression
    chain (regexp_replace + fixed replace ladder), whole-stage codegen
    end to end; 100 TB costs one scan.
    """
    tag = r"<[^>]*>"
    src = F.col(text_col)
    cleaned = _tags_to_spaces(src)
    for ent, ch in _HTML_ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(ch))
    cleaned = _collapse_ws(cleaned)
    return df.select(
        F.col(id_col),
        cleaned.alias("text"),
        F.regexp_count(src, F.lit(tag)).cast("bigint").alias("n_tags"),
        (F.length(src) - F.length(cleaned)).cast("bigint").alias(
            "n_chars_removed"
        ),
    )


def _bpe_rounds(
    df: DataFrame,
    n_merges: int,
    text_col: str,
    checkpoint_every: int = 50,
    on_round=None,
) -> tuple[list[tuple], DataFrame]:
    """Shared round loop for :func:`bpe_train` / :func:`bpe_encode`:
    returns (learned rules, final (word, cnt, sym) vocabulary frame
    with every merge applied).  See bpe_train for the scale contract.

    ``checkpoint_every``: localCheckpoint the vocabulary frame every N
    merge rounds (0 disables).  Each round chains one fold projection
    onto the plan, so an unbounded run grows analysis cost linearly
    (and eventually quadratically in total work); the periodic
    checkpoint truncates lineage to the materialized vocabulary --
    measured flat per-round cost through 200 merges in BPE_SCALE.json.

    ``on_round``: optional callable invoked as ``on_round(rank)`` after
    each completed round (bench instrumentation hook; no-op when None).

    Hybrid execution (the :func:`..dedup.dedup_clusters` pattern,
    r18): the vocabulary frame is distinct-word-sized -- orders of
    magnitude smaller than the corpus -- so when it fits
    ``_BPE_DRIVER_VOCAB`` rows the whole merge loop runs on the driver
    over ONE collected copy: one Spark job total instead of one argmax
    job per round.  The driver replica is exact by construction: it
    consumes the SAME Spark-computed symbol arrays (no re-splitting,
    so char-boundary conventions cannot drift), counts pairs with the
    same cnt weights, breaks count ties on (left, right) binary string
    order (Python str comparison = codepoint order = Spark/DuckDB
    UTF-8 binary order), and merges leftmost-first non-overlapping
    exactly as the fold does.  Above the threshold the distributed
    round loop takes over unchanged -- the right shape when the
    vocabulary itself is huge (millions of distinct words at 100 TB).
    """
    sym = F.split(F.col("word"), "")
    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", sym.alias("sym"), "cnt")
    )
    # cache BEFORE the probe (r19): the probe pays the full corpus scan
    # + vocab aggregation either way, so let it double as the cache
    # warmer -- previously the over-threshold fallback discarded the
    # probe's work and the .cache() below recomputed the identical
    # lineage, making huge-vocab corpora pay the vocabulary build twice
    words = words.cache()
    # one computation: a limit probe collects the vocab iff it fits
    probe = words.limit(_BPE_DRIVER_VOCAB + 1).collect()
    if len(probe) <= _BPE_DRIVER_VOCAB:
        words.unpersist(blocking=False)  # driver branch: cache not needed
        vocab = [(r["word"], list(r["sym"]), r["cnt"]) for r in probe]
        rules = []
        for rank in range(1, int(n_merges) + 1):
            pair_count: dict = {}
            for _w, syms, cnt in vocab:
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    pair_count[k] = pair_count.get(k, 0) + cnt
            if not pair_count:
                break
            # argmax on (count desc, left asc, right asc) -- the exact
            # orderBy(pair_count.desc, left, right).limit(1) order
            (left, right), cnt_best = min(
                pair_count.items(), key=lambda kv: (-kv[1], kv[0])
            )
            rules.append((rank, left, right, left + right, cnt_best))
            merged = left + right
            for row_i, (_w, syms, _c) in enumerate(vocab):
                if left not in syms:
                    continue
                out: list = []
                i = 0
                n_s = len(syms)
                while i < n_s:
                    if (
                        i + 1 < n_s
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[row_i] = (_w, out, _c)
            if on_round is not None:
                on_round(rank)
        frame = df.sparkSession.createDataFrame(
            vocab, "word string, sym array<string>, cnt bigint"
        )
        return rules, frame

    def _pairs(frame: DataFrame) -> DataFrame:
        p = frame.select(
            "cnt",
            F.explode(
                F.when(
                    F.size("sym") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("sym") - 1),
                        lambda i: F.struct(
                            F.element_at("sym", i).alias("left"),
                            F.element_at("sym", i + 1).alias("right"),
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("p"),
        )
        return p.groupBy("p.left", "p.right").agg(
            F.sum("cnt").alias("pair_count")
        )

    rules = []
    frame = words
    for rank in range(1, int(n_merges) + 1):
        best = (
            _pairs(frame)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0].left, best[0].right, best[0].pair_count
        rules.append((rank, left, right, left + right, cnt))
        # leftmost-first non-overlapping merge, folded over a flat
        # space-joined accumulator (symbols never contain spaces)
        folded = F.aggregate(
            F.expr("slice(sym, 2, size(sym))"),
            F.element_at("sym", 1),
            lambda acc, x: F.when(
                (F.regexp_extract(acc, r"([^ ]*)$", 1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.regexp_replace(acc, r"[^ ]*$", ""), F.lit(left + right)
                ),
            ).otherwise(F.concat(acc, F.lit(" "), x)),
        )
        frame = frame.select(
            "word", F.split(folded, " ").alias("sym"), "cnt"
        )
        if checkpoint_every and rank % int(checkpoint_every) == 0:
            # truncate lineage: the vocab frame is compact
            # (distinct-word-sized), so materializing it is cheap and
            # keeps every later round's plan O(checkpoint_every) deep
            frame = frame.localCheckpoint(eager=True)
        if on_round is not None:
            on_round(rank)
    # NOTE: the returned frame's lineage still reads the cached base
    # vocabulary; the caller consumes it before any unpersist matters.
    words.unpersist(blocking=False)
    return rules, frame


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 50,
) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (the iterative loop that
    :func:`__spark_entry__._q_bpe_pair_counts`'s one-step counting
    primitive belongs to): learn ``n_merges`` merge rules over the
    corpus, character-level start symbols, words bounded at whitespace
    (no cross-word merges, the GPT-2/SentencePiece convention).  Output
    one row per learned rule, ``(merge_rank, left, right, merged,
    pair_count)``, in learning order.

    The classic scale trick makes this tractable: the corpus is
    scanned ONCE to build the ``(word, count)`` VOCABULARY (one
    corpus-wide shuffle, result ~ distinct-word-sized, millions of
    rows at 100 TB -- not trillions), and every merge round then
    iterates on that compact frame: one map-side-combined aggregate
    over its adjacent symbol pairs (weighted by word count), a 1-ROW
    collect of the argmax (the same bounded driver-probe precedent as
    ``dedup.py``'s HLL scalar), and a row-local fold that rewrites
    each word's symbol sequence leftmost-first non-overlapping.  Ties
    on the count break on (left, right) binary string order, so the
    learned table is a pure function of the corpus.

    Symbols are space-joined inside the fold (tokens are
    whitespace-split, so ' ' can never occur INSIDE a symbol), which
    keeps the accumulator a flat string -- the same fold the DuckDB
    oracle replicates with ``list_reduce``.  Only the BASE vocabulary
    is cached; each round chains one lazy row-local fold projection on
    top of it, so a round costs exactly ONE job (the argmax collect)
    with no cache-churn or materialization jobs.  Lineage grows one
    projection per round; ``checkpoint_every`` (default 50) truncates
    lineage with a cheap vocabulary-frame localCheckpoint so per-round
    cost stays flat at real merge counts (measured through 200 merges,
    BPE_SCALE.json).

    Preconditions: ``n_merges`` small enough that pairs remain (an
    exhausted corpus -- every word one symbol -- stops early and
    returns fewer rows).
    """
    return bpe_train_and_encode(df, n_merges, text_col, checkpoint_every)[0]


def bpe_encode(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 50,
) -> DataFrame:
    """Train-and-APPLY: the corpus encoded under its own learned BPE
    merges -- the tokenizer-application half of :func:`bpe_train`,
    sharing the identical round loop, so the returned segmentation is
    exactly what the learned rules produce.  One row per vocabulary
    WORD: ``(word, cnt, n_symbols, encoded)`` with ``encoded`` the
    space-joined symbol sequence after all merges; per-document
    encoding is then a plain broadcast join of this frame onto
    exploded tokens (word-keyed, vocabulary-sized -- not done here to
    keep the output compact).

    Same scale shape as training: rounds cost vocabulary-sized
    aggregates, the corpus pays one scan.
    """
    return bpe_train_and_encode(df, n_merges, text_col, checkpoint_every)[1]


def bpe_train_and_encode(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """One round loop, BOTH outputs: ``(rules, encoded_vocab)`` exactly
    as :func:`bpe_train` / :func:`bpe_encode` would return them.  The
    production shape -- a tokenizer is trained ONCE and both its merge
    table and its applied vocabulary are persisted artifacts -- without
    paying the merge rounds twice the way calling the two functions
    separately would."""
    rules, frame = _bpe_rounds(df, n_merges, text_col, checkpoint_every)
    rules_df = df.sparkSession.createDataFrame(
        rules,
        "merge_rank long, left string, right string, merged string,"
        " pair_count long",
    )
    encoded = frame.select(
        "word",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.size("sym").cast("bigint").alias("n_symbols"),
        F.concat_ws(" ", "sym").alias("encoded"),
    )
    return rules_df, encoded


def bpe_apply(
    df: DataFrame,
    encoded_vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a TRAINED vocabulary (:func:`bpe_encode` output, typically
    read back from its persisted artifact) to documents: one row per
    doc with its encoded symbol sequence and BPE token count -- the
    tokenizer-application step a training-data pipeline runs over every
    shard with merges learned once.

    Out-of-vocabulary words (absent from the training corpus) fall back
    to their character symbols -- exactly what the learned merge table
    produces for a word none of its rules match.

    Scale shape: the vocabulary frame broadcasts (vocabulary-sized --
    millions of rows at 100 TB, not trillions); tokens explode with
    their position, take one hash-join lookup against the broadcast,
    and re-assemble with ONE doc-keyed shuffle carrying (position,
    encoded-word) pairs -- document text itself never rides the
    exchange.  Empty docs survive with zero tokens (left join on the
    doc spine).
    """
    spine = df.select(id_col)
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("__pos", "word"),
    )
    vocab = encoded_vocab.select("word", F.col("encoded").alias("__enc"))
    looked = toks.join(F.broadcast(vocab), "word", "left").select(
        id_col,
        "__pos",
        # OOV fallback: character symbols, space-joined (symbols never
        # contain spaces -- the same invariant the merge fold relies on)
        F.coalesce(
            "__enc", F.concat_ws(" ", F.split(F.col("word"), ""))
        ).alias("__enc"),
    )
    per_doc = looked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "__enc"))),
                lambda x: x["__enc"],
            ),
        ).alias("encoded"),
    )
    out = spine.join(per_doc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_words", F.lit(0).cast("bigint")).alias("n_words"),
        F.coalesce("encoded", F.lit("")).alias("encoded"),
        F.when(F.col("encoded").isNull() | (F.col("encoded") == ""), F.lit(0))
        .otherwise(F.size(F.split(F.col("encoded"), " ")))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


def normalize_unicode(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFKC",
    strip_control: bool = True,
):
    """Unicode normalization for ingest (the ftfy-lite step every web
    pipeline runs before fingerprinting): ``unicodedata.normalize``
    to ``form`` (NFKC default -- fullwidth/compatibility characters
    collapse to their canonical ASCII-ish forms, so dedup fingerprints
    and tokenizers see one spelling), plus optional control-character
    stripping (C0/C1 except tab/newline) and NBSP -> space.

    Output: the input columns with ``text_col`` rewritten plus
    ``n_changed`` -- a per-row 0/1 flag for whether normalization
    changed the text (sum it for the corpus-level count).  Scale shape: Arrow-batched
    ``mapInPandas``, per-row independent, zero shuffle (Spark has no
    builtin unicode-normalize expression; this is the honest Python
    boundary, same contract as the codecs).
    """
    import pandas as pd  # noqa: F401

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, n_changed int"
    cols = [f.name for f in df.schema.fields]

    def _gen(batches):
        import re
        import unicodedata

        import pandas as _pd

        ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
        for pdf in batches:
            out = pdf.copy()
            norm = []
            changed = []
            for t in pdf[text_col]:
                if not isinstance(t, str):
                    norm.append(None)  # NULL stays NULL, not ''
                    changed.append(0)
                    continue
                v = unicodedata.normalize(form, t).replace(" ", " ")
                if strip_control:
                    v = ctrl.sub("", v)
                norm.append(v)
                changed.append(int(v != t))
            out[text_col] = norm
            out["n_changed"] = _pd.Series(changed, index=pdf.index, dtype="int32")
            yield _pd.DataFrame(out, columns=cols + ["n_changed"])

    return df.mapInPandas(_gen, out_schema)


def _main_content_blocks(
    html: str,
    min_chars: int,
    max_link_density: float,
) -> str | None:
    """Pure block-density extractor behind :func:`extract_main_content`
    (module-level so the heuristic is unit-testable without Spark).

    The public jusText/Arc90 idea re-derived: split markup into
    block-level segments, score each by text length and LINK density
    (navigation/footer chrome is short and link-saturated; article
    prose is long and link-sparse), keep the dense-prose blocks.  No
    DOM is built -- blocks come from block-level tag boundaries, text
    from tag stripping -- which is the honest regex-grade trade the
    rest of the text stack makes.
    """
    import re as _re

    if html is None:
        return None
    # head/title and script/style/noscript bodies are never content
    s = _re.sub(
        r"<(head|title|script|style|noscript)\b[^>]*>.*?</\1\s*>", " ",
        html, flags=_re.S | _re.I,
    )
    # any opener still standing is UNCLOSED (the paired ones are gone):
    # browsers consume to the closing tag or EOF, so a truncated
    # <script> swallows the rest of the page -- keep that invariant
    # instead of leaking raw JS/CSS into "content"
    m = _re.search(r"<(?:script|style|noscript)\b", s, _re.I)
    if m:
        s = s[: m.start()]
    s = _re.sub(r"<!--.*?-->", " ", s, flags=_re.S)

    # positional masks instead of per-block regex: an anchor that WRAPS
    # block-level tags (link cards: <a><h3>..</h3><p>..</p></a>) is
    # split apart by the block cut, so its text must be attributed by
    # POSITION, not by re-matching <a>..</a> inside each fragment
    in_tag = bytearray(len(s))
    for t in _re.finditer(r"<[^>]*>", s):
        for i in range(t.start(), t.end()):
            in_tag[i] = 1
    in_anchor = bytearray(len(s))
    for a in _re.finditer(r"<a\b[^>]*>(.*?)</a\s*>", s, _re.S | _re.I):
        for i in range(a.start(1), a.end(1)):
            in_anchor[i] = 1

    block_tag = _re.compile(
        r"</?(?:p|div|section|article|main|aside|nav|header|footer|"
        r"h[1-6]|ul|ol|li|table|tr|td|th|blockquote|pre|br)\b[^>]*>",
        _re.I,
    )
    bounds: list[tuple[int, int]] = []
    prev = 0
    for bm in block_tag.finditer(s):
        bounds.append((prev, bm.start()))
        prev = bm.end()
    bounds.append((prev, len(s)))

    kept: list[str] = []
    # ASCII \s ONLY (re.ASCII): Python's default \s and str.isspace()
    # are unicode-aware (NBSP, U+2028/U+2029...), but the Spark-side
    # total (Java regex \s) and the DuckDB oracle (RE2 \s) both mean
    # the identical ASCII set [ \t\n\r\f\x0b] -- a unicode collapse
    # here made kept text/fractions diverge on NBSP pages (r18
    # unicode sweep catch).  Multibyte whitespace is CONTENT to this
    # operator, exactly as it is to tokens()/norm_ws().
    _ascii_ws = " \t\n\r\f\x0b"
    for lo, hi in bounds:
        text = _re.sub(
            r"\s+", " ", _re.sub(r"<[^>]*>", " ", s[lo:hi]),
            flags=_re.ASCII,
        ).strip(_ascii_ws)
        if len(text) < min_chars:
            continue
        content_chars = link_chars = 0
        for i in range(lo, hi):
            if in_tag[i] or s[i] in _ascii_ws:
                continue
            content_chars += 1
            if in_anchor[i]:
                link_chars += 1
        if link_chars / max(content_chars, 1) > max_link_density:
            continue
        kept.append(text)
    return "\n".join(kept) if kept else ""


def extract_main_content(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 25,
    max_link_density: float = 0.3,
) -> DataFrame:
    """Main-content extraction for raw web pages: keep the long,
    link-sparse blocks (article prose), drop the short or
    link-saturated ones (navigation, footers, sidebars, tag clouds) --
    the step between the crawler and :func:`strip_markup`-grade
    cleaning that decides WHICH text a page contributes at all.

    Output ``(id, text, n_kept_chars, kept_frac)`` where ``kept_frac``
    is kept-text over total stripped-text length -- a per-page chrome
    signal worth profiling (template-heavy sites sit near 0; a NULL
    page profiles as NULL, never as "all chrome").

    Scale shape: row-local Arrow-batched pandas UDF (block grammar +
    nested anchor extraction is beyond a sane regexp_replace chain --
    the same honest-boundary call as :func:`..web.read_warc`); zero
    shuffle, one scan at 100 TB.
    """
    import pandas as pd

    def _extract(texts):
        return pd.Series(
            [
                _main_content_blocks(t, min_chars, max_link_density)
                for t in texts
            ]
        )

    extract = F.pandas_udf(_extract, "string")
    total = F.length(_collapse_ws(_tags_to_spaces(F.col(text_col))))
    out = df.withColumn("__main", extract(F.col(text_col)))
    null_in = F.col(text_col).isNull()
    return out.select(
        F.col(id_col),
        F.col("__main").alias("text"),
        F.when(null_in, F.lit(None))
        .otherwise(F.coalesce(F.length("__main"), F.lit(0)))
        .cast("bigint")
        .alias("n_kept_chars"),
        F.when(null_in, F.lit(None))
        .otherwise(
            F.round(
                F.coalesce(F.length("__main"), F.lit(0))
                / F.greatest(total.cast("double"), F.lit(1.0)),
                4,
            )
        )
        .alias("kept_frac"),
    )
