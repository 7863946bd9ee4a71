"""Embedding preprocessing: one-pass moments vs numpy AND a DuckDB
oracle, PCA/whitening contracts, deterministic signs, Arrow projection
semantics + plan shape, expression-only l2_normalize."""

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_stream_flink_user_address_spark.functions.embedding import (  # noqa: E402
    apply_projection,
    embedding_moments,
    l2_normalize,
    train_pca_whitening,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def _np_corpus(spark):
    rows = _emb(spark).orderBy("vec_id").collect()
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_moments_match_numpy_exactly_enough(spark):
    x = _np_corpus(spark)
    mean, cov, n = embedding_moments(_emb(spark))
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=0, atol=1e-9)
    want_cov = (x.T @ x) / n - np.outer(x.mean(axis=0), x.mean(axis=0))
    np.testing.assert_allclose(cov, want_cov, rtol=0, atol=1e-9)


def test_moments_match_duckdb_oracle(spark):
    """The one-pass partial-Gram reduction against an independent SQL
    derivation: mean and three covariance entries (diagonal, off-
    diagonal, last) recomputed by DuckDB from the same parquet."""
    mean, cov, n = embedding_moments(_emb(spark))
    con = duckdb.connect()
    path = os.path.join(SF, "embeddings.parquet")
    for i, j in [(0, 0), (0, 1), (3, 7), (63, 63)]:
        (want,) = con.execute(
            f"""
            SELECT avg(embedding[{i + 1}]::DOUBLE * embedding[{j + 1}]::DOUBLE)
                   - avg(embedding[{i + 1}]::DOUBLE)
                     * avg(embedding[{j + 1}]::DOUBLE)
            FROM '{path}'
            """
        ).fetchone()
        assert abs(cov[i, j] - want) < 1e-9, (i, j)
    (want_n, want_m0) = con.execute(
        f"SELECT count(*), avg(embedding[1]::DOUBLE) FROM '{path}'"
    ).fetchone()
    assert n == want_n
    assert abs(mean[0] - want_m0) < 1e-12


def test_moments_reject_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="NULL vector"):
        embedding_moments(df)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        embedding_moments(empty)


def test_whitening_contract_identity_covariance(spark):
    """THE whitening contract: the projected corpus' population
    covariance is the identity (up to eps), which transitively
    verifies the numpy eigendecomposition layer no SQL oracle can
    reach."""
    model = train_pca_whitening(_emb(spark), whiten=True)
    out = apply_projection(_emb(spark), model, out_col="w")
    _, cov_w, _ = embedding_moments(out, vec_col="w")
    np.testing.assert_allclose(
        cov_w, np.eye(model["k"]), rtol=0, atol=1e-4
    )


def test_pca_truncation_orders_and_captures_variance(spark):
    x = _np_corpus(spark)
    model = train_pca_whitening(_emb(spark), k=8, whiten=False)
    lam = np.asarray(model["eigvals"])
    assert lam.shape == (8,)
    assert np.all(np.diff(lam) <= 1e-12)  # descending
    # projected variance along component i == eigenvalue i
    out = apply_projection(_emb(spark), model, out_col="p")
    _, cov_p, _ = embedding_moments(out, vec_col="p")
    np.testing.assert_allclose(np.diag(cov_p), lam, rtol=1e-4, atol=1e-6)
    # and the top-8 eigvals dominate: they match numpy's full spectrum
    full = np.linalg.eigvalsh(np.cov(x.T, bias=True))[::-1][:8]
    np.testing.assert_allclose(lam, full, rtol=1e-6, atol=1e-9)


def test_training_is_deterministic_and_signed(spark):
    m1 = train_pca_whitening(_emb(spark), k=4)
    m2 = train_pca_whitening(_emb(spark), k=4)
    assert m1 == m2
    w = np.asarray(m1["components"])
    # sign convention: each component's largest-|entry| row is positive
    for c in range(w.shape[1]):
        assert w[np.abs(w[:, c]).argmax(), c] > 0, c


def test_apply_projection_matches_numpy_and_keeps_nulls(spark):
    model = train_pca_whitening(_emb(spark), k=5, whiten=False)
    df = spark.createDataFrame(
        [(0, [float(i) for i in range(64)]), (1, None)],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r["out"]
        for r in apply_projection(df, model, out_col="out").collect()
    }
    assert rows[1] is None
    x = np.array([float(i) for i in range(64)])
    want = (x - np.asarray(model["mean"])) @ np.asarray(model["components"])
    np.testing.assert_allclose(rows[0], want.astype(np.float32), rtol=1e-6)


def test_projection_oracle_replay_with_inlined_model(spark):
    """Given the trained model as literals, the projection is plain
    affine SQL: DuckDB recomputes component 0 for every vector and the
    rounded values must agree -- the bpe_train persisted-artifact
    pattern, applied to linear algebra."""
    model = train_pca_whitening(_emb(spark), k=3)
    out = apply_projection(_emb(spark), model, out_col="p")
    got = {
        r["vec_id"]: round(float(r["p"][0]), 4)
        for r in out.select("vec_id", "p").collect()
    }
    mean = model["mean"]
    col0 = [row[0] for row in model["components"]]
    terms = " + ".join(
        f"(embedding[{i + 1}]::DOUBLE - ({mean[i]!r})) * ({col0[i]!r})"
        for i in range(64)
    )
    path = os.path.join(SF, "embeddings.parquet")
    con = duckdb.connect()
    for vec_id, want in con.execute(
        f"SELECT vec_id, round(({terms})::DOUBLE, 4) FROM '{path}'"
    ).fetchall():
        assert abs(got[vec_id] - want) < 2e-4, vec_id


def test_projection_plan_is_scan_fused_row_local(spark):
    import contextlib
    import io

    model = train_pca_whitening(_emb(spark), k=4)
    out = apply_projection(_emb(spark), model, out_col="p")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan  # row-local: partitioning untouched


def test_l2_normalize_units_zeros_and_no_udf(spark):
    import contextlib
    import io

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [0.0, -2.0])],
        "vec_id long, embedding array<float>",
    )
    out = l2_normalize(df)
    rows = {r["vec_id"]: r["embedding"] for r in out.collect()}
    np.testing.assert_allclose(rows[0], [0.6, 0.8], rtol=1e-6)
    assert rows[1] == [0.0, 0.0]  # zero vector passes through
    np.testing.assert_allclose(rows[2], [0.0, -1.0], rtol=1e-6)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    for node in ("ArrowEvalPython", "BatchEvalPython", "Exchange"):
        assert node not in plan, node
