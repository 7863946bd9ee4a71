"""semantic_dedup (SemDeDup) unit tests: hand-built clusters with known
near-duplicate structure, plus the determinism/representative invariants
the oracle parity check relies on."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.functions.semantic import semantic_dedup

DIM = 4


def _vec(*xs):
    return [float(x) for x in xs] + [0.0] * (DIM - len(xs))


@pytest.fixture(scope="module")
def corpus(spark):
    # two well-separated directions; ids interleaved across clusters so
    # the keep rule's id ordering is exercised within, not across, groups
    rows = [
        (1, _vec(1, 0)),        # cluster A representative (smallest id)
        (2, _vec(0, 1)),        # cluster B representative
        (3, _vec(0.99, 0.1)),   # near-dup of 1 -> dropped
        (4, _vec(0.05, 1.0)),   # near-dup of 2 -> dropped
        (5, _vec(0.6, -0.8)),   # assigned to A but far from everything -> kept
        (6, _vec(-0.1, 0.9)),   # near-dup of 2 (and 4) -> dropped
    ]
    return spark.createDataFrame(rows, f"vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def centroids(spark):
    rows = [(10, _vec(1, 0)), (20, _vec(0, 1))]
    return spark.createDataFrame(rows, "cid long, centroid array<double>")


def test_known_clusters_and_keeps(corpus, centroids):
    out = semantic_dedup(corpus, centroids, threshold=0.9, dim=DIM)
    got = {r.vec_id: (r.cluster_id, r.keep) for r in out.collect()}
    assert got == {
        1: (10, True),
        3: (10, False),
        5: (10, True),
        2: (20, True),
        4: (20, False),
        6: (20, False),
    }


def test_smallest_id_of_any_clique_is_kept(corpus, centroids):
    # invariant behind the deterministic rule: within a cluster, the
    # smallest id overall can never be dropped
    out = semantic_dedup(corpus, centroids, threshold=0.0, dim=DIM)
    rows = out.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        smallest = min(m.vec_id for m in members)
        assert all(m.keep for m in members if m.vec_id == smallest)
        # threshold 0: everything pairs with everything -> only the
        # smallest id survives
        assert sum(m.keep for m in members) == 1


def test_cross_cluster_near_dups_not_examined(spark, centroids):
    # two identical vectors forced into different clusters by tie-break?
    # no -- identical vectors always co-assign.  Instead: vectors near
    # the decision boundary on opposite sides stay un-pruned even at a
    # loose threshold, pinning the documented recall contract.
    rows = [(1, _vec(1, 0.9)), (2, _vec(0.9, 1))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(e, centroids, threshold=0.5, dim=DIM)
    got = {r.vec_id: (r.cluster_id, r.keep) for r in out.collect()}
    # cosine(v1, v2) ~ 0.994 but they sit in different clusters
    assert got == {1: (10, True), 2: (20, True)}


def test_zero_vector_never_duplicates(spark, centroids):
    rows = [(1, _vec(1, 0)), (2, _vec(0, 0))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(e, centroids, threshold=0.1, dim=DIM)
    assert all(r.keep for r in out.collect())


def test_max_cluster_rows_salt_splits_oversized_cluster(spark, centroids):
    from pyspark.sql import functions as F

    # 12 identical vectors -> one cluster; cap 5 -> 3 deterministic
    # sub-groups, one survivor per non-empty sub-group (instead of a
    # single survivor without the fuse)
    rows = [(i, _vec(1, 0)) for i in range(1, 13)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = semantic_dedup(e, centroids, threshold=0.9, dim=DIM)
    assert sum(r.keep for r in base.collect()) == 1

    salted = semantic_dedup(
        e, centroids, threshold=0.9, dim=DIM, max_cluster_rows=5
    )
    rows_out = salted.collect()
    kept = [r.vec_id for r in rows_out if r.keep]
    # every row still reported exactly once, in the original cluster
    assert sorted(r.vec_id for r in rows_out) == list(range(1, 13))
    assert all(r.cluster_id == 10 for r in rows_out)
    # survivors = one per salt group: more than 1, at most ceil(12/5)
    assert 1 < len(kept) <= 3
    # determinism: same salt assignment every run
    again = [r.vec_id for r in semantic_dedup(
        e, centroids, threshold=0.9, dim=DIM, max_cluster_rows=5
    ).collect() if r.keep]
    assert sorted(again) == sorted(kept)


def test_cluster_stratified_sample_flattens(spark):
    from data_stream_flink_user_address_spark.functions.sampling import (
        cluster_stratified_sample,
    )

    # one huge cluster (900 rows), one small (20): target = mean = 460
    # -> small cluster kept whole, huge cluster cut to ~51%
    rows = [(i, 1) for i in range(900)] + [(i, 2) for i in range(900, 920)]
    df = spark.createDataFrame(rows, "doc_id long, cluster_id int")
    out = cluster_stratified_sample(df).collect()
    by_c = {}
    for r in out:
        by_c[r.cluster_id] = by_c.get(r.cluster_id, 0) + 1
    assert by_c[2] == 20                      # rate 1.0: all kept
    assert 0.4 * 900 < by_c[1] < 0.62 * 900   # rate 460/900 ~ 0.51
    # replay-stable
    again = cluster_stratified_sample(df).count()
    assert again == len(out)
    # explicit target overrides the mean
    tiny = cluster_stratified_sample(df, target_per_cluster=10).collect()
    assert len(tiny) < 40


def test_cluster_stratified_sample_keeps_null_stratum(spark):
    from data_stream_flink_user_address_spark.functions.sampling import (
        cluster_stratified_sample,
    )

    # unassigned rows (NULL cluster) are a real stratum: they must
    # sample like any other group, not silently vanish in the join
    rows = [(i, 1) for i in range(10)] + [(i, None) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "doc_id long, cluster_id int")
    out = cluster_stratified_sample(df).collect()
    assert any(r.cluster_id is None for r in out)
    # mean target = 10 -> both strata kept whole
    assert len(out) == 20
