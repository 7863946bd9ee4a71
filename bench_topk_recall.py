"""Measured recall for the approximate top-k paths (VERDICT r5 item 4).

``embedding_near_dup_lsh`` got the measured-recall treatment in r5; the
top-k ANN variants document theirs here.  For each sf dir, recall@5 of

- ``lsh_bucketed_topk`` (6 hyperplanes, seed 42 -- the headline
  ``similarity_lsh_topk`` configuration), and
- ``ivf_topk`` (stride-31 coarse centroids, nprobe=3 -- the headline
  ``similarity_ivf_topk`` configuration), and
- ``pq_topk`` (8x8 PQ, 32-entry codebooks, expand=16 -- the headline
  ``similarity_pq_topk`` configuration; candidates from 8-byte codes)

against ``brute_force_topk`` ground truth on the same 10 query vectors:

    recall@5 = |approx(q) intersect exact(q)| / |exact(q)|, averaged
    over queries (exact(q) is the true top-5 id set).

Writes TOPK_RECALL.json and prints it.
Run:  python bench_topk_recall.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.pq import (
    ivfpq_topk,
    pq_topk,
    train_pq_codebooks,
)
from data_stream_flink_user_address_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    train_ivf_centroids,
)
import __spark_entry__ as em
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.sources.tables import load_table

K = 5
SF_DIRS = os.environ.get(
    "SPARK_GRAFT_RECALL_SFS", "/root/testdata/sf0.01,/root/testdata/sf0.1"
).split(",")


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    per_q = [
        len(approx.get(q, set()) & ids) / len(ids) for q, ids in exact.items()
    ]
    return round(sum(per_q) / len(per_q), 4)


def main() -> None:
    spark = get_spark("topk-recall")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"k": K, "sfs": {}}
    for sf_dir in SF_DIRS:
        e = load_table(spark, sf_dir, "embeddings", spread=True)
        q = e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        n = e.count()
        exact = _topk_sets(brute_force_topk(e, q, k=K))
        lsh = _topk_sets(lsh_bucketed_topk(e, q, k=K, n_planes=6, dim=64, seed=42))
        ivf = _topk_sets(
            ivf_topk(e, q, k=K, centroid_stride=31, nprobe=3, dim=64)
        )
        # Lloyd-trained centroids: same stride init, same nprobe -> any
        # recall delta is purely the training (identical search cost)
        trained = _topk_sets(
            ivf_topk(
                e, q, k=K, nprobe=3, dim=64,
                centroids=train_ivf_centroids(
                    e, iters=em._IVF_TRAIN_ITERS, centroid_stride=31, dim=64
                ),
            )
        )
        # PQ-ADC (headline similarity_pq_topk configuration): candidate
        # generation reads 8-byte codes; recall governed by expand
        pq = _topk_sets(
            pq_topk(
                e, q, k=K, expand=em._PQ_EXPAND, m=em._PQ_M,
                k_sub=em._PQ_KSUB, stride=em._PQ_STRIDE, dim=64,
            )
        )
        # Lloyd-trained PQ codebooks (1 round -- the measured plateau,
        # same finding as IVF training): identical search cost, recall
        # delta is purely the training
        pq_tr = _topk_sets(
            pq_topk(
                e, q, k=K, expand=em._PQ_EXPAND, m=em._PQ_M,
                k_sub=em._PQ_KSUB, stride=em._PQ_STRIDE, dim=64,
                codebooks=train_pq_codebooks(
                    e, iters=1, m=em._PQ_M, k_sub=em._PQ_KSUB,
                    stride=em._PQ_STRIDE, dim=64,
                ),
            )
        )
        ivfpq = _topk_sets(
            ivfpq_topk(
                e, q, k=K, expand=8, nprobe=3, centroid_stride=31,
                m=em._PQ_M, k_sub=em._PQ_KSUB, stride=em._PQ_STRIDE, dim=64,
            )
        )
        out["sfs"][sf_dir] = {
            "n_vectors": n,
            "lsh_recall_at_5": _recall(lsh, exact),
            "lsh_avg_candidates": round(n / 2 ** 6, 1),
            "ivf_recall_at_5": _recall(ivf, exact),
            "ivf_trained_recall_at_5": _recall(trained, exact),
            "ivf_train_iters": em._IVF_TRAIN_ITERS,
            "ivf_probed_fraction": round(3 / max(1, n // 31), 4),
            "pq_recall_at_5": _recall(pq, exact),
            "pq_bytes_per_vector": em._PQ_M,
            "ivfpq_recall_at_5": _recall(ivfpq, exact),
            "pq_trained_recall_at_5": _recall(pq_tr, exact),
            "pq_train_iters": 1,
        }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "TOPK_RECALL.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
