"""DuckDB-oracle parity for the r13b operators that are SQL-expressible
(library-level; NOT in the driver registry -- the 94-query window is an
exact two-round cycle, so these verify locally with the same harness
the registry uses).
"""

import pytest
from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.classifier import (
    apply_nb_quality,
    train_nb_quality,
)
from data_stream_flink_user_address_spark.functions.ordering import epoch_shuffle
from data_stream_flink_user_address_spark.functions.profile import top_terms
from data_stream_flink_user_address_spark.functions.sampling import (
    importance_resample,
)
from tests.oracle_harness import compare, duckdb_conn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_epoch_shuffle_assignment_oracle(spark, docs, con):
    got = epoch_shuffle(docs, seed=11, epoch=2, n_shards=8).select(
        "doc_id", "epoch_order", "shard"
    )
    sql = """
        SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR || '|11|2'), 1, 15))::BIGINT
                   AS epoch_order,
               ((('0x' || substr(md5(doc_id::VARCHAR || '|11|2'), 1, 15))::BIGINT)
                   % 8)::INT AS shard
        FROM documents
    """
    assert compare(got, con, sql, "epoch_shuffle") == []


def test_top_terms_oracle(spark, docs, con):
    got = top_terms(docs, k=25)
    sql = """
        SELECT term, count(*)::BIGINT AS n
        FROM (
            SELECT lower(unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS term
            FROM documents
            WHERE trim(text) <> ''
        )
        GROUP BY term
        ORDER BY n DESC, term ASC
        LIMIT 25
    """
    assert compare(got, con, sql, "top_terms") == []


def test_importance_resample_exact_oracle(spark, docs, con):
    lw = docs.select(
        "doc_id", (F.col("doc_id") % 7).cast("double").alias("log_weight")
    )
    got = importance_resample(lw, fraction=0.2, seed=5, exact=True).select("doc_id")
    sql = """
        SELECT doc_id FROM (
            SELECT doc_id,
                   (doc_id % 7)::DOUBLE
                   - ln(-ln(
                       ((('0x' || substr(md5(doc_id::VARCHAR || '|5'), 1, 15))::BIGINT
                         % 1000000) + 0.5) / 1000000.0
                     )) AS gkey
            FROM documents
        )
        ORDER BY gkey DESC, doc_id ASC
        LIMIT 100
    """
    n = docs.count()
    assert n == 500  # sf0.001: ceil(0.2 * 500) = 100 drives the LIMIT above
    assert compare(got, con, sql, "importance_resample") == []


def test_nb_scores_oracle(spark, con):
    """Full train-and-score replication in SQL: hashed unigram+bigram
    counts -> smoothed log-odds -> per-doc score.  Weights round to
    1e-9 in both engines; the per-doc sum re-rounds to 1e-6 on both
    sides so double accumulation order cannot flip the comparison."""
    rows = [
        (0, "good solid analysis with careful methods", 1),
        (1, "careful clear writing and solid evidence", 1),
        (2, "click buy cheap offer now", 0),
        (3, "cheap click spam offer free now now", 0),
    ]
    train = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    weights, info = train_nb_quality(train, n_features=1 << 12)
    scored = apply_nb_quality(
        train.drop("label"), weights, info
    ).select("doc_id", F.round("nb_score", 6).alias("score"))

    vals = ", ".join(f"({i}, '{t}', {y})" for i, t, y in rows)
    v = 1 << 12
    sql = f"""
        WITH raw(doc_id, text, label) AS (VALUES {vals}),
        arrs AS (
            SELECT doc_id, label,
                   list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS a
            FROM raw
        ),
        toks AS (
            SELECT doc_id, label, i AS pos, lower(a[i]) AS tok
            FROM arrs, unnest(range(1, len(a) + 1)) AS t(i)
        ),
        uni AS (
            SELECT doc_id, label,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT % {v} AS feature
            FROM toks
        ),
        bi AS (
            SELECT a.doc_id, a.label,
                   ('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 15))::BIGINT % {v}
                       AS feature
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        counts AS (
            SELECT feature,
                   sum(label) AS pos, count(*) - sum(label) AS neg
            FROM feats GROUP BY feature
        ),
        tot AS (SELECT sum(pos) AS pt, sum(neg) AS nt FROM counts),
        w AS (
            SELECT feature,
                   round(ln((pos + 1.0) / (pt + 1.0 * {v}))
                         - ln((neg + 1.0) / (nt + 1.0 * {v})), 9) AS weight
            FROM counts, tot
        ),
        prior AS (
            SELECT round(ln(sum(label)::DOUBLE / (count(*) - sum(label))), 9) AS p
            FROM raw
        ),
        contrib AS (
            SELECT f.doc_id, coalesce(w.weight,
                   (SELECT round(ln(1.0 / (pt + 1.0 * {v}))
                                - ln(1.0 / (nt + 1.0 * {v})), 9) FROM tot)) AS c
            FROM feats f LEFT JOIN w USING (feature)
        ),
        scores AS (
            SELECT doc_id, round(sum(c) + (SELECT p FROM prior), 9) AS s
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id::BIGINT AS doc_id, round(s, 6) AS score FROM scores
    """
    assert compare(scored, con, sql, "nb_scores") == []


def test_cross_corpus_decontaminate_pairs_oracle(spark, docs, con):
    """Exact-band decontamination pairs replicated in SQL: both corpora
    ride ONE side-tagged signature chain (same md5 base hash, mix
    params, and band-key layout as the registered minhash oracle)."""
    import __spark_entry__ as em
    from data_stream_flink_user_address_spark.functions.dedup import (
        MINHASH_PRIME,
        cross_corpus_decontaminate,
        minhash_mix_params,
    )

    ev = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    _, pairs = cross_corpus_decontaminate(docs, ev)  # defaults: 16 hashes, 4x4
    got = pairs.select("doc_id", "eval_doc_id", "agreement")

    params = minhash_mix_params(16)
    mins = ", ".join(
        f"min(({a} * h0 + {b}) % {MINHASH_PRIME})" for a, b in params
    )
    sql = f"""
        WITH allc AS (
            SELECT doc_id, text, 't' AS side FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text, 'e' FROM documents
            WHERE doc_id % 10 = 0
        ),
        norm AS (SELECT doc_id, side, {em._sql_norm()} AS t FROM allc),
        sh AS (
            SELECT DISTINCT doc_id, side, substr(t, i, 5) AS shingle
            FROM norm, unnest(range(1, greatest(length(t) - 4, 1) + 1)) AS u(i)
            WHERE length(substr(t, i, 5)) = 5
        ),
        hashed AS (
            SELECT doc_id, side,
                   ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h0
            FROM sh
        ),
        sig AS (
            SELECT doc_id, side, [{mins}] AS signature
            FROM hashed GROUP BY doc_id, side
        ),
        bands AS (
            SELECT doc_id, side,
                   md5(b.i::VARCHAR || ',' ||
                       array_to_string(signature[b.i * 4 + 1 : b.i * 4 + 4], ',')) AS band_key
            FROM sig CROSS JOIN range(4) b(i)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS eval_doc_id,
                   1.0::DOUBLE AS agreement
            FROM bands a JOIN bands b USING (band_key)
            WHERE a.side = 't' AND b.side = 'e'
        )
        SELECT * FROM pairs
    """
    assert got.count() >= 50  # every planted copy pairs with its source
    assert compare(got, con, sql, "decontaminate_pairs") == []


def test_upsample_oracle(spark, docs, con):
    from data_stream_flink_user_address_spark.functions.sampling import (
        upsample,
    )

    w = docs.select(
        "doc_id", ((F.col("doc_id") % 30) / F.lit(10.0)).alias("factor")
    )
    got = upsample(w, "factor").select("doc_id", "copy_idx")
    sql = """
        WITH w AS (
            SELECT doc_id, (doc_id % 30) / 10.0 AS factor FROM documents
        ),
        n AS (
            SELECT doc_id,
                   (floor(factor)
                    + CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR || '|42'), 1, 15))::BIGINT
                                 % 1000000)
                               < CAST(trunc((factor - floor(factor)) * 1000000) AS BIGINT)
                           THEN 1 ELSE 0 END)::INT AS n_copies
            FROM w
            WHERE factor > 0
        )
        SELECT doc_id, unnest(range(0, n_copies))::INT AS copy_idx
        FROM n WHERE n_copies > 0
    """
    assert compare(got, con, sql, "upsample") == []


def test_corpus_diff_oracle(spark, docs, con):
    """Full diff classification (incl. the md5 fingerprints themselves)
    replicated in DuckDB over derived old/new snapshots of documents."""
    from data_stream_flink_user_address_spark.functions.profile import (
        corpus_diff,
    )

    old = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 != 1).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 2,
            F.concat(F.col("text"), F.lit(" edited")),
        ).otherwise(F.col("text")).alias("text"),
    )
    got = corpus_diff(old, new)
    sql = r"""
        WITH olds AS (
            SELECT doc_id,
                   md5(CASE WHEN text IS NULL THEN NULL ELSE coalesce(array_to_string(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''), ' '), '') END) AS old_fp
            FROM documents WHERE doc_id % 10 <> 0
        ), news AS (
            SELECT doc_id,
                   md5(CASE WHEN (CASE WHEN doc_id % 10 = 2 THEN text || ' edited' ELSE text END) IS NULL THEN NULL ELSE coalesce(array_to_string(list_filter(regexp_split_to_array((CASE WHEN doc_id % 10 = 2 THEN text || ' edited' ELSE text END), '\s+'), x -> x <> ''), ' '), '') END) AS new_fp
            FROM documents WHERE doc_id % 10 <> 1
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.old_fp IS NOT DISTINCT FROM n.new_fp
                         THEN 'unchanged'
                    ELSE 'changed' END AS status,
               o.old_fp, n.new_fp
        FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id
    """
    assert compare(got, con, sql, "corpus_diff") == []


def test_curriculum_order_oracle(spark, docs, con):
    """Full curriculum assignment replicated in DuckDB: stage from
    quantile_disc cuts (percentile_approx is GK-exact at this n and
    both engines pick the same discrete rank element -- probed before
    pinning), order key and shard from the md5 idiom."""
    from data_stream_flink_user_address_spark.functions.ordering import (
        curriculum_order,
    )

    scored = docs.select("doc_id", (F.col("doc_id") % 97).alias("score"))
    got = curriculum_order(
        scored, "score", n_stages=4, n_shards=8, seed=11, epoch=2
    ).select("doc_id", "score", "stage", "epoch_order", "shard")
    sql = """
        WITH cuts AS (
            SELECT quantile_disc(doc_id % 97, [0.25, 0.5, 0.75]) AS c
            FROM documents
        )
        SELECT doc_id,
               (doc_id % 97)::BIGINT AS score,
               (CASE WHEN doc_id % 97 > c[1] THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 97 > c[2] THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 97 > c[3] THEN 1 ELSE 0 END)::INT
                   AS stage,
               ('0x' || substr(md5(doc_id::VARCHAR || '|11|2'), 1, 15))::BIGINT
                   AS epoch_order,
               ((('0x' || substr(md5(doc_id::VARCHAR || '|11|2'), 1, 15))::BIGINT)
                   % 8)::INT AS shard
        FROM documents, cuts
    """
    assert compare(got, con, sql, "curriculum_order") == []
