"""Scale ladder for the embedding-preprocessing family
(functions/embedding.py): one-pass moments, PCA/whitening train,
Arrow-batched projection throughput, the whitening contract error at
scale, and the dimensionality-reduction payoff (PCA-16 candidate-gen
recall against exact full-dim cosine).

Synthetic anisotropic corpus: z ~ N(0,1)^16 stretched through a fixed
seeded 64x16 mixing matrix plus noise -- embeddings with a real
low-rank structure, so PCA-16 has signal to find (uniform random
vectors would make any projection useless by construction).

Run: ``python bench_embedding_pca.py`` -> EMB_SCALE.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.embedding import (
    apply_projection,
    embedding_moments,
    train_pca_whitening,
)
from data_stream_flink_user_address_spark.session import get_spark

D = 64
RANK = 16


def synth(spark, n: int):
    """Deterministic anisotropic vectors, generated distributed:
    each Arrow batch seeds numpy from its first id, so the corpus is
    reproducible for a fixed partitioning and never bottlenecks the
    driver."""
    rng = np.random.RandomState(42)
    mix = rng.standard_normal((RANK, D)) * np.linspace(4.0, 0.5, RANK)[:, None]
    mean = rng.standard_normal(D) * 2.0
    mix_l = mix.tolist()
    mean_l = mean.tolist()

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        m = _np.asarray(mix_l)
        mu = _np.asarray(mean_l)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            r = _np.random.RandomState(int(ids[0]) % (2**31))
            z = r.standard_normal((len(ids), RANK))
            noise = r.standard_normal((len(ids), D)) * 0.05
            x = (z @ m + mu + noise).astype(_np.float32)
            yield _pd.DataFrame({"vec_id": ids, "embedding": list(x)})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )


def run_size(spark, n: int, with_recall: bool) -> dict:
    vecs = synth(spark, n).localCheckpoint()  # freeze: timings measure the ops
    row: dict = {"n": n, "dim": D}

    t0 = time.perf_counter()
    _, cov, cnt = embedding_moments(vecs)
    row["moments"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "vecs_per_sec": round(cnt / (time.perf_counter() - t0), 1),
    }

    t0 = time.perf_counter()
    model = train_pca_whitening(vecs, k=RANK, whiten=True)
    row["train_k16_whiten"] = {"wall_s": round(time.perf_counter() - t0, 2)}

    t0 = time.perf_counter()
    out = apply_projection(vecs, model, out_col="w")
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    row["apply"] = {
        "wall_s": round(dt, 2),
        "vecs_per_sec": round(n / dt, 1),
    }

    _, cov_w, _ = embedding_moments(out, vec_col="w")
    row["whiten_identity_max_err"] = float(
        np.abs(cov_w - np.eye(RANK)).max()
    )

    if with_recall:
        # PCA-16 candidate gen vs exact full-dim cosine: for 50 query
        # vectors, take top-50 candidates by PROJECTED cosine (plain
        # PCA, not whitening -- whitening equalizes the noise
        # directions and is the wrong transform for candidate
        # generation), rerank the candidates exactly, measure
        # recall@10 against the exact top-10
        pca = train_pca_whitening(vecs, k=RANK, whiten=False)
        sample = np.stack(
            [np.asarray(r["embedding"]) for r in vecs.limit(5000).collect()]
        ).astype(np.float64)
        queries = sample[:50]
        corpus = sample[50:]
        mean = np.asarray(pca["mean"])
        w = np.asarray(pca["components"])
        qn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        proj = (corpus - mean) @ w
        projn = proj / np.linalg.norm(proj, axis=1, keepdims=True)
        hits = 0
        for q in queries:
            exact = np.argsort(
                -(qn @ (q / np.linalg.norm(q)))
            )[:10]
            pq = (q - mean) @ w
            cands = np.argsort(-(projn @ (pq / np.linalg.norm(pq))))[:50]
            rerank = cands[np.argsort(-(qn[cands] @ (q / np.linalg.norm(q))))][
                :10
            ]
            hits += len(set(exact) & set(rerank))
        row["pca16_rerank_recall_at_10"] = round(hits / (10 * len(queries)), 4)

    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    spark = get_spark("bench_embedding_pca")
    spark.sparkContext.setLogLevel("ERROR")
    results = [
        run_size(spark, 100_000, with_recall=True),
        run_size(spark, 1_000_000, with_recall=False),
        # the scale rung: 1e7 x 64 floats (~2.5 GB) -- the partial-Gram
        # reduce must stay one slim row per partition, throughput flat
        run_size(spark, 10_000_000, with_recall=False),
    ]
    out = {
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        "dim": D,
        "synthetic_rank": RANK,
        "sizes": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "EMB_SCALE.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
