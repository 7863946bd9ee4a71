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

    artifact = {
        "n_base": N_BASE,
        "n_dup": N_DUP,
        "dim": DIM,
        "sigma": SIGMA,
        "threshold": THRESHOLD,
        "lloyd_iters": ITERS,
        "results": results,
    }
    with open("SEMDEDUP_RECALL.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote SEMDEDUP_RECALL.json")


if __name__ == "__main__":
    main()
