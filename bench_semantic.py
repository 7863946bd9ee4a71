"""SemDeDup recall/precision on a planted-duplicate corpus.

The sf* embeddings are near-uniform (little cluster structure), so they
cannot show what cluster-bounded pruning costs in recall.  This bench
plants the structure: ``n_base`` unit Gaussian vectors plus ``n_dup``
near-copies (base + sigma*noise, renormalized), then asks
``semantic_dedup`` to find the copies with training/assignment exactly
as the engine query runs them.

Measured per centroid-stride setting:
- recall: fraction of planted copies marked keep=false,
- false_drop: fraction of base vectors dropped (should stay ~0 at a
  high threshold),
- pair_frac: the within-cluster candidate-pair count as a fraction of
  all-pairs -- the compute saving that motivates SemDeDup.

Writes ``SEMDEDUP_RECALL.json``.  Usage: ``python bench_semantic.py``.
"""

from __future__ import annotations

import json
import time

import numpy as np

from data_stream_flink_user_address_spark.functions.semantic import semantic_dedup
from data_stream_flink_user_address_spark.functions.similarity import (
    train_ivf_centroids,
)
from data_stream_flink_user_address_spark.session import get_spark

N_BASE = 5000
N_DUP = 500
DIM = 64
SIGMA = 0.02          # noise norm ~ 0.02*sqrt(64) = 0.16 -> cosine(base, copy) ~ 0.99
THRESHOLD = 0.9
ITERS = 2


def make_corpus(seed: int = 7):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = rng.integers(0, N_BASE, size=N_DUP)
    dup = base[src] + SIGMA * rng.standard_normal((N_DUP, DIM))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    # ids: base 0..N_BASE-1, dups N_BASE.. (so the copy always has the
    # larger id and the deterministic rule must drop the COPY)
    vecs = np.vstack([base, dup]).astype(np.float32)
    return vecs, src




# ---------------------------------------------------------------------------
# skew-fuse measurement: ONE runaway cluster (VERDICT r8 ask #5)
# ---------------------------------------------------------------------------

N_HOT = 3000          # boilerplate mode: all land in one k-means cluster
N_COLD = 2500
HOT_DUP = 300
COLD_DUP = 200
HOT_SPREAD = 0.07     # tight mode (hot-pair cosine ~0.76: clustered, not dup)


def make_runaway_corpus(seed: int = 11):
    """A corpus with one dominant tight mode (the "boilerplate crawl
    segment" of the semantic_dedup docstring) plus spread vectors, and
    planted near-copies of both populations."""
    rng = np.random.default_rng(seed)
    hub = rng.standard_normal(DIM)
    hub /= np.linalg.norm(hub)
    hot = hub + HOT_SPREAD * rng.standard_normal((N_HOT, DIM))
    hot /= np.linalg.norm(hot, axis=1, keepdims=True)
    cold = rng.standard_normal((N_COLD, DIM))
    cold /= np.linalg.norm(cold, axis=1, keepdims=True)
    base = np.vstack([hot, cold])
    src = np.concatenate([
        rng.integers(0, N_HOT, size=HOT_DUP),
        rng.integers(N_HOT, N_HOT + N_COLD, size=COLD_DUP),
    ])
    dup = base[src] + SIGMA * rng.standard_normal((len(src), DIM))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    return np.vstack([base, dup]).astype(np.float32)


def runaway_case(spark) -> dict:
    """semantic_dedup on the runaway corpus, fuse off vs on.

    Reports per setting: wall, recall on planted copies, false drops,
    and max_task_rows -- the largest applyInPandas group (the quadratic
    matrix one task must hold).  The fuse bounds max_task_rows at the
    cost of recall (a pair split across salt buckets is never compared);
    the artifact quantifies that trade so the 100 TB guidance ("more
    centroids first, fuse for the cluster you did not predict") has a
    measured basis.
    """
    from pyspark.sql import functions as F

    vecs = make_runaway_corpus()
    n_base = N_HOT + N_COLD
    n_dup = HOT_DUP + COLD_DUP
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    emb.count()
    # large stride -> few centroids: Lloyd cannot afford to split the
    # hot mode, so one cluster swallows all of it (the planted runaway)
    cent = train_ivf_centroids(emb, iters=ITERS, centroid_stride=1999, dim=DIM).cache()
    k_cent = cent.count()

    out_rows = []
    for cap in (None, 1500, 500):
        t0 = time.time()
        out = semantic_dedup(
            emb, cent, threshold=THRESHOLD, dim=DIM, max_cluster_rows=cap
        ).cache()
        collected = out.collect()
        wall = time.time() - t0

        dropped = {r.vec_id for r in collected if not r.keep}
        planted = set(range(n_base, n_base + n_dup))
        recall = len(dropped & planted) / n_dup
        false_drop = len(dropped - planted) / n_base

        # reproduce the fuse's salt expression to measure the largest
        # group a single task actually received
        csize = out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
        if cap is None:
            max_task = csize.agg(F.max("csize")).collect()[0][0]
        else:
            n_sub = F.ceil(F.col("csize") / cap)
            bucketed = (
                out.join(csize, "cluster_id")
                .withColumn("__salt", F.pmod(F.xxhash64("vec_id"), n_sub))
                .groupBy("cluster_id", "__salt")
                .agg(F.count(F.lit(1)).alias("bsize"))
            )
            max_task = bucketed.agg(F.max("bsize")).collect()[0][0]
        out.unpersist()
        out_rows.append(
            {
                "max_cluster_rows": cap,
                "k_cent": k_cent,
                "recall": round(recall, 4),
                "false_drop": round(false_drop, 6),
                "max_task_rows": int(max_task),
                "wall_s": round(wall, 2),
            }
        )
        print(out_rows[-1])
    cent.unpersist()
    emb.unpersist()
    return {
        "n_hot": N_HOT,
        "n_cold": N_COLD,
        "n_dup": n_dup,
        "hot_spread": HOT_SPREAD,
        "results": out_rows,
    }


def main() -> None:
    spark = get_spark("bench-semantic")
    vecs, src = make_corpus()
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    emb.count()

    results = []
    for stride in (997, 499, 199, 97, 47):
        t0 = time.time()
        cent = train_ivf_centroids(
            emb, iters=ITERS, centroid_stride=stride, dim=DIM
        ).cache()
        k_cent = cent.count()
        out = semantic_dedup(emb, cent, threshold=THRESHOLD, dim=DIM)
        rowsout = out.collect()
        wall = time.time() - t0
        dropped = {r.vec_id for r in rowsout if not r.keep}
        planted = set(range(N_BASE, N_BASE + N_DUP))
        recall = len(dropped & planted) / N_DUP
        false_drop = len(dropped - planted) / N_BASE
        sizes = {}
        for r in rowsout:
            sizes[r.cluster_id] = sizes.get(r.cluster_id, 0) + 1
        n = N_BASE + N_DUP
        pair_frac = sum(s * (s - 1) // 2 for s in sizes.values()) / (n * (n - 1) // 2)
        cent.unpersist()
        results.append(
            {
                "stride": stride,
                "k_cent": k_cent,
                "recall": round(recall, 4),
                "false_drop": round(false_drop, 6),
                "pair_frac": round(pair_frac, 5),
                "max_cluster": max(sizes.values()),
                "wall_s": round(wall, 2),
            }
        )
        print(results[-1])

    runaway = runaway_case(spark)

    artifact = {
        "n_base": N_BASE,
        "n_dup": N_DUP,
        "dim": DIM,
        "sigma": SIGMA,
        "threshold": THRESHOLD,
        "lloyd_iters": ITERS,
        "results": results,
        "runaway_cluster": runaway,
    }
    with open("SEMDEDUP_RECALL.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote SEMDEDUP_RECALL.json")


if __name__ == "__main__":
    main()
