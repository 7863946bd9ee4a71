"""Embedding preprocessing: one-pass corpus moments, PCA / whitening
training, and Arrow-batched projection -- the step between raw encoder
output and the similarity/ANN stack (``similarity.py``, ``pq.py``,
``quantize.py``).

Engine extension beyond the reference surface.  Production embedding
pipelines rarely index raw encoder vectors: dimensionality reduction
(PCA to 16-64 dims before IVF/PQ) and whitening (decorrelate +
rescale so every direction contributes equally to the metric) are
standard preprocessing (the OPQ/"improving PQ by rotation" family of
results), and both need the corpus MEAN and COVARIANCE -- a global
aggregate this module computes in ONE pass with no corpus shuffle.

Scale shape, explicitly:

- :func:`embedding_moments` runs ``mapInPandas`` yielding ONE partial
  row per PARTITION (count, sum vector, flattened X^T X Gram block --
  ``d + d*d`` doubles, ~33 KB at d=64), then combines the
  partition-count-sized partial frame exactly on the driver.  A 100 TB
  corpus costs one scan, zero exchanges, and a collect measured in
  partition count, not rows.
- :func:`train_pca_whitening` eigendecomposes the d x d covariance on
  the driver (numpy ``eigh``; d is hundreds at most -- this is
  histogram_pack's solver-on-the-driver trade: corpus-size-independent
  milliseconds) with a deterministic sign convention so reruns and
  different LAPACK builds produce the identical model.
- :func:`apply_projection` broadcasts the (mean, components) model
  inside an Arrow-batched pandas UDF: each batch is ONE numpy matmul
  (BLAS), row-local, scan-fused -- the corpus never shuffles and never
  leaves its partitioning.

No SQL spelling exists for the eigendecomposition, but everything
around it is oracle-checkable: the moments are plain sums of products
(DuckDB replica in ``tests/test_embedding.py``), and the projection
given a trained model is literal affine arithmetic, replayed in SQL
with the model inlined.  The whitening CONTRACT (sample covariance of
the projected corpus == identity to rounding) is the end-to-end
property test that covers the numpy layer.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(
    df: DataFrame,
    vec_col: str = "embedding",
) -> tuple["object", "object", int]:
    """Exact corpus ``(mean, covariance, n)`` of an ``array<float>``
    column in one pass.

    Covariance is the population form ``E[xx^T] - mean mean^T``
    (divide by n, not n-1): the corpora this feeds are millions of
    vectors up, where the distinction is noise, and the population
    form keeps the whitening contract exact (projected covariance ==
    identity) for the fuzz sizes the tests pin.  NULL, wrong-length,
    and NON-FINITE vectors raise -- a silent skip would bias the model,
    and a NaN/Inf component would otherwise poison every dimension's
    moments (worse: the Arrow partial round-trip nulls NaN sums, so the
    failure would surface as an unrelated TypeError on the driver).
    Filter with ``similarity.vec_is_finite`` upstream.

    Returns numpy ``(mean[d], cov[d, d], n)``.
    """
    import numpy as np

    schema = "n long, s array<double>, ss array<double>"

    def partials(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as _np
        import pandas as _pd

        n = 0
        s = None
        ss = None
        dim = None
        for pdf in batches:
            col = pdf[vec_col]
            if col.isnull().any():
                raise ValueError("embedding_moments: NULL vector")
            if len(col) == 0:
                continue
            x = _np.stack(col.to_numpy()).astype(_np.float64)
            if not _np.isfinite(x).all():
                raise ValueError(
                    "embedding_moments: non-finite vector component -- "
                    "filter with vec_is_finite upstream"
                )
            if dim is None:
                dim = x.shape[1]
                s = _np.zeros(dim)
                ss = _np.zeros((dim, dim))
            elif x.shape[1] != dim:
                raise ValueError(
                    f"embedding_moments: mixed dims {x.shape[1]} vs {dim}"
                )
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield _pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(partials, schema).collect()
    if not rows:
        raise ValueError("embedding_moments: empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return mean, cov, int(n)


def train_pca_whitening(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int | None = None,
    whiten: bool = True,
    eps: float = 1e-9,
) -> dict:
    """Train a PCA (``whiten=False``) or PCA-whitening projection from
    the corpus: ``y = W^T (x - mean)`` with ``W = U_k`` (PCA) or
    ``W = U_k diag(1/sqrt(lambda_k + eps))`` (whitening), components
    ordered by DESCENDING eigenvalue.

    Determinism: ``eigh`` eigenvector signs are arbitrary, so each
    component is flipped to make its largest-|entry| coordinate
    positive (first such coordinate on ties) -- reruns, other BLAS
    builds, and the oracle's inlined model all agree bit-for-bit
    afterwards.

    Returns ``{"mean": [d], "components": [d][k] (column = component),
    "eigvals": [k], "k": k, "whiten": bool, "n": corpus size}`` --
    plain lists, json-serializable, the bpe_train persisted-artifact
    convention: train once on a sample or the full corpus, save, apply
    everywhere.
    """
    import numpy as np

    mean, cov, n = embedding_moments(df, vec_col)
    d = mean.shape[0]
    k = d if k is None else int(k)
    if not 1 <= k <= d:
        raise ValueError(f"k={k} outside [1, {d}]")
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    lam = eigvals[order]
    u = eigvecs[:, order]
    # sign convention: the largest-|entry| coordinate of each component
    # is positive; np.argmax takes the first index on exact ties
    flip = np.sign(u[np.abs(u).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    u = u * flip
    w = u / np.sqrt(np.maximum(lam, 0.0) + eps) if whiten else u
    return {
        "mean": mean.tolist(),
        "components": w.tolist(),
        "eigvals": lam.tolist(),
        "k": k,
        "whiten": bool(whiten),
        "n": n,
    }


def apply_projection(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Project every vector through a :func:`train_pca_whitening`
    model: ``out = (x - mean) @ W``, emitted as ``array<float>``
    (the similarity stack's storage dtype) in ``out_col`` (default:
    replace ``vec_col``).

    Row-local Arrow-batched pandas UDF -- one BLAS matmul per batch,
    model shipped once per executor via closure capture, no shuffle,
    no change to the input partitioning: a downstream IVF/PQ index
    build starts exactly where the scan left the data.  NULL vectors
    stay NULL (projection must not fabricate rows -- the corpus_diff
    convention).
    """
    out_col = vec_col if out_col is None else out_col
    mean_l = list(model["mean"])
    comp_l = [list(c) for c in model["components"]]

    def project(series):
        import numpy as np
        import pandas as pd

        mean = np.asarray(mean_l)
        w = np.asarray(comp_l)
        nulls = series.isnull()
        if nulls.all():
            return pd.Series([None] * len(series))
        filled = series[~nulls]
        x = np.stack(filled.to_numpy()).astype(np.float64)
        y = ((x - mean) @ w).astype(np.float32)
        out = pd.Series([None] * len(series), dtype="object")
        out.iloc[(~nulls).to_numpy().nonzero()[0]] = list(y)
        return out

    proj = F.pandas_udf(project, "array<float>")
    return df.withColumn(out_col, proj(F.col(vec_col)))


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Unit-norm every vector (zero vectors pass through unchanged --
    dividing by zero would NaN-poison every downstream dot product).
    Pure expression chain over the array column: JVM-evaluated
    ``zip_with``/``aggregate``, zero UDF, zero shuffle -- after this,
    cosine == dot, which is what lets the top-k kernels skip the norm
    division on 100 TB of pairs.
    """
    out_col = vec_col if out_col is None else out_col
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return df.withColumn(
        out_col,
        F.when(
            norm > 0.0,
            F.transform(v, lambda x: (x.cast("double") / norm).cast("float")),
        ).otherwise(v),
    )
