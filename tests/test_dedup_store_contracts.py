"""Persisted dedup-store format contracts (VERDICT r17 ask #2 + ADVICE).

r17 changed fingerprint normalization (``norm_ws``/``tokens`` strip ALL
edge whitespace, not just 0x20), so every store built before r17 holds
incompatible fingerprints for newline-edged text.  The docstrings said
REBUILD; nothing machine-checked it -- a stale store silently re-admitted
exactly the duplicate class r17 fixed.  These tests pin the enforcement:

* builders stamp ``__fmt`` = STORE_FORMAT_VERSION on every row;
* every consumer (incremental gates, band-store matchers, compactors)
  refuses a store without the column (v1) or with a mismatched value,
  with rebuild instructions in the error;
* the stamped round-trip keeps working end to end (same survivors).

Also pins the ADVICE r17 simhash contract: zero-token (blank) docs get
no signature row since r17, so they BYPASS the simhash store/gate
entirely -- never stored, absent from survivors -- and must be handled
by exact dedup upstream (whose norm_ws fingerprint maps every blank to
one value).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_stream_flink_user_address_spark.functions.dedup import (  # noqa: E402
    STORE_FORMAT_VERSION,
    assert_store_format,
    build_bucketed_fingerprint_store,
    build_fingerprint_store,
    build_minhash_band_store,
    build_simhash_band_store,
    compact_bucketed_fingerprint_store,
    exact_dedup,
    incremental_exact_dedup,
    incremental_exact_dedup_bucketed,
    incremental_simhash_dedup,
    minhash_store_matches,
    simhash,
    simhash_store_matches,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def corpus(spark):
    return _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
         (3, "alpha beta gamma"), (4, "eta theta iota kappa")],
    )


# ---------------------------------------------------------------------------
# builders stamp the format version
# ---------------------------------------------------------------------------


def test_builders_stamp_format_version(spark, corpus, tmp_path):
    build_fingerprint_store(corpus, str(tmp_path / "fp"))
    st = spark.read.parquet(str(tmp_path / "fp"))
    assert "__fmt" in st.columns
    vals = {r[0] for r in st.select("__fmt").distinct().collect()}
    assert vals == {STORE_FORMAT_VERSION}

    try:
        build_bucketed_fingerprint_store(
            corpus, "t_fmt_fp_b", str(tmp_path / "fpb"), n_buckets=2,
            epoch=-1,
        )
        build_minhash_band_store(
            corpus, "t_fmt_mh_b", str(tmp_path / "mhb"), n_buckets=2,
            epoch=-1,
        )
        build_simhash_band_store(
            corpus, "t_fmt_sh_b", str(tmp_path / "shb"), n_buckets=2,
            epoch=-1,
        )
        for t in ("t_fmt_fp_b", "t_fmt_mh_b", "t_fmt_sh_b"):
            st = spark.table(t)
            assert "__fmt" in st.columns, t
            vals = {r[0] for r in st.select("__fmt").distinct().collect()}
            assert vals == {STORE_FORMAT_VERSION}, t
    finally:
        for t in ("t_fmt_fp_b", "t_fmt_mh_b", "t_fmt_sh_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


# ---------------------------------------------------------------------------
# consumers refuse v1 (pre-r17) stores
# ---------------------------------------------------------------------------


def _write_v1_path_store(spark, path):
    """A pre-r17 store shape: fingerprints under __batch, NO __fmt."""
    (
        spark.createDataFrame(
            [("00" * 16,), ("11" * 16,)], ["fingerprint"]
        )
        .withColumn("__batch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("__batch")
        .parquet(path)
    )


def test_incremental_exact_dedup_refuses_v1_store(spark, corpus, tmp_path):
    path = str(tmp_path / "v1fp")
    _write_v1_path_store(spark, path)
    with pytest.raises(ValueError, match="__fmt.*pre-r17|pre-r17"):
        incremental_exact_dedup(corpus, path, batch_id=1)
    # and the failed call must NOT have appended batch 1 to the store
    st = spark.read.parquet(path)
    assert {r[0] for r in st.select("__batch").distinct().collect()} == {0}


def test_bucketed_consumers_refuse_v1_store(spark, corpus, tmp_path):
    from data_stream_flink_user_address_spark.sources.layout import (
        write_bucketed,
    )

    v1_fp = (
        corpus.select(F.md5(F.trim("text")).alias("fingerprint"))
        .distinct()
        .withColumn("__epoch", F.lit(-1))
    )
    sigs = simhash(corpus)
    try:
        write_bucketed(
            v1_fp, "t_v1_fp", "fingerprint", 2, str(tmp_path / "v1b")
        )
        with pytest.raises(ValueError, match="predates store format"):
            incremental_exact_dedup_bucketed(corpus, "t_v1_fp")
        with pytest.raises(ValueError, match="predates store format"):
            compact_bucketed_fingerprint_store(
                spark, "t_v1_fp", "t_v1_fp_c", str(tmp_path / "v1bc")
            )

        from data_stream_flink_user_address_spark.functions.dedup import (
            band_rows,
            minhash_signatures_text,
            simhash_band_rows,
        )

        v1_mh = band_rows(
            minhash_signatures_text(corpus), "doc_id", 4, 4,
            keep_signature=True,
        ).withColumn("__epoch", F.lit(-1))
        write_bucketed(
            v1_mh, "t_v1_mh", "band_key", 2, str(tmp_path / "v1mh")
        )
        with pytest.raises(ValueError, match="predates store format"):
            minhash_store_matches(
                minhash_signatures_text(corpus), "t_v1_mh"
            ).count()

        v1_sh = simhash_band_rows(
            sigs, "doc_id", 32, 3, keep_signature=True
        ).withColumn("__epoch", F.lit(-1))
        write_bucketed(
            v1_sh, "t_v1_sh", "band_key", 2, str(tmp_path / "v1sh")
        )
        with pytest.raises(ValueError, match="predates store format"):
            simhash_store_matches(sigs, "t_v1_sh").count()
    finally:
        for t in ("t_v1_fp", "t_v1_fp_c", "t_v1_mh", "t_v1_sh"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_version_value_mismatch_refused(spark):
    """A store WITH the column but a stale version number (future
    format bumps) is refused by the one-row value probe."""
    st = spark.createDataFrame(
        [("00" * 16, -1, 1)], ["fingerprint", "__epoch", "__fmt"]
    )
    with pytest.raises(ValueError, match="format v1, engine expects"):
        assert_store_format(st, "stale")


def test_empty_store_with_column_passes(spark):
    """An empty (but current-schema) store is consumable -- first() has
    no row to probe and the schema check suffices."""
    st = spark.createDataFrame(
        [], "fingerprint string, __epoch int, __fmt int"
    )
    assert assert_store_format(st, "empty") is st


# ---------------------------------------------------------------------------
# stamped round-trip still works end to end
# ---------------------------------------------------------------------------


def test_stamped_store_roundtrip_same_survivors(spark, corpus, tmp_path):
    path = str(tmp_path / "fp_rt")
    build_fingerprint_store(
        _docs(spark, [(0, "alpha beta gamma")]), path, batch_id=0
    )
    out = incremental_exact_dedup(corpus, path, batch_id=1)
    got = {r["doc_id"] for r in out.collect()}
    # doc 1/3 duplicate the seeded content; 2 and 4 survive
    assert got == {2, 4}
    # replay: same survivors, store unchanged as a set
    again = incremental_exact_dedup(corpus, path, batch_id=1)
    assert {r["doc_id"] for r in again.collect()} == {2, 4}


# ---------------------------------------------------------------------------
# ADVICE r17: blank docs bypass the simhash gate
# ---------------------------------------------------------------------------


def test_blank_docs_bypass_simhash_gate(spark, tmp_path):
    blanks = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, ""), (3, "   \n\t "),
         (4, "alpha beta gamma delta")],
    )
    # no signature rows for the blanks at all
    sigs = simhash(blanks)
    assert {r["doc_id"] for r in sigs.collect()} == {1, 4}
    try:
        build_simhash_band_store(
            blanks, "t_blank_sh", str(tmp_path / "blanksh"),
            n_buckets=2, epoch=-1,
        )
        stored = spark.table("t_blank_sh")
        assert {r["doc_id"] for r in stored.select("doc_id").collect()} == {
            1, 4,
        }
        # a later batch of blanks is NOT gated by the store: they are
        # simply absent from the gate's output (neither stored nor
        # surviving) -- exact dedup upstream owns blanks
        batch = _docs(spark, [(5, "\n\n"), (6, "alpha beta gamma delta")])
        out = incremental_simhash_dedup(batch, "t_blank_sh")
        assert {r["doc_id"] for r in out.collect()} == set()
        # the upstream handler the docstring mandates: exact dedup's
        # norm_ws fingerprint maps every blank to ONE fingerprint
        exact = exact_dedup(
            _docs(spark, [(2, ""), (3, "   \n\t "), (5, "\n\n")])
        )
        assert exact.count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_blank_sh")
