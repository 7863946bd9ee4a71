"""Scale ladder for the r14 operators: corpus snapshot diff and
curriculum ordering.

- corpus_diff: old = generated corpus; new = old with 1% of ids
  removed, 1% new ids appended, and 2% of texts edited -- the
  re-crawl shape.  The diff must classify every id and its cost is a
  slim (id, md5) full-outer join: docs/s should track the scan rate,
  and the exchange never carries text (plan-tested in
  tests/test_profile.py).
- curriculum_order: 4 quantile stages x 32 shards, materialized via
  write_curriculum_shards.  Cost target = epoch_shuffle + one extra
  corpus scan for the GK sketch (two passes, one corpus exchange).

Writes R14_OPS_SCALE.json.  Run:  python bench_r14_ops_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_curation_scale import gen_corpus
from data_stream_flink_user_address_spark.functions.ordering import (
    write_curriculum_shards,
)
from data_stream_flink_user_address_spark.functions.profile import corpus_diff
from data_stream_flink_user_address_spark.session import get_spark

SIZES = [100_000, 1_000_000, 10_000_000]


def main() -> None:
    spark = get_spark("bench-r14-ops")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sizes": []}
    for n in SIZES:
        row = {"n_docs": n}
        docs = spark.read.parquet(gen_corpus(spark, n))

        # --- corpus_diff: re-crawl with 1% removed / 1% added / 2% changed
        old = docs.select("doc_id", "text")
        new = (
            docs.filter(F.col("doc_id") % 100 != 0)  # 1% removed
            .select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 100 == 1,  # ~1% changed (of old)
                    F.concat(F.col("text"), F.lit(" recrawl edit")),
                )
                .when(
                    F.col("doc_id") % 100 == 2,
                    F.concat(F.lit("prefix edit "), F.col("text")),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .unionByName(  # 1% added: fresh ids past the old range
                docs.filter(F.col("doc_id") % 100 == 3).select(
                    (F.col("doc_id") + 10 * n).alias("doc_id"), "text"
                )
            )
        )
        t0 = time.time()
        counts = dict(
            (r.status, r.n)
            for r in corpus_diff(old, new)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        dt = time.time() - t0
        assert counts.get("removed", 0) == n // 100, counts
        row["corpus_diff"] = {
            "status_counts": counts,
            "wall_s": round(dt, 2),
            "docs_per_sec": round(n / dt, 1),
        }

        # --- curriculum: 4 stages x 32 shards, materialized layout
        scored = docs.select(
            "doc_id", "text", F.pmod(F.xxhash64("doc_id"), F.lit(1000)).alias("score")
        )
        path = f"/tmp/r14_curriculum_n{n}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        manifest = write_curriculum_shards(
            scored, path, "score", n_stages=4, n_shards=32, seed=7
        ).collect()
        dt = time.time() - t0
        sizes = [r.n_rows for r in manifest]
        stage_rows = {}
        for r in manifest:
            stage_rows[r.stage] = stage_rows.get(r.stage, 0) + r.n_rows
        row["curriculum"] = {
            "n_stage_shards": len(sizes),
            "rows_written": sum(sizes),
            "stage_rows": {str(k): v for k, v in sorted(stage_rows.items())},
            "stage_skew_max_over_mean": round(
                max(stage_rows.values()) / (sum(stage_rows.values()) / len(stage_rows)), 3
            ),
            "wall_s": round(dt, 2),
            "docs_per_sec": round(n / dt, 1),
        }
        shutil.rmtree(path, ignore_errors=True)

        # --- robots politeness filter: 1000-domain frontier, 5 rules
        # each; the corpus joins the broadcast one-row-per-domain rule
        # table and longest-matches row-locally (Arrow batches).  The
        # UDF is the honest boundary (regex grammar); throughput should
        # be flat in corpus size and independent of frontier size.
        from data_stream_flink_user_address_spark.functions.web import (
            filter_robots_allowed,
        )

        robots = spark.range(1000).select(
            F.concat(F.lit("site"), F.col("id"), F.lit(".example")).alias(
                "domain"
            ),
            F.concat(
                F.lit("User-agent: *\nDisallow: /private/\n"),
                F.lit("Allow: /private/public\nDisallow: /tmp/*\n"),
                F.lit("Disallow: /drafts$\n"),
            ).alias("robots_txt"),
        )
        urls = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://site"),
                F.pmod(F.col("doc_id"), F.lit(2000)),  # half have no robots
                F.lit(".example/"),
                F.element_at(
                    F.array(
                        F.lit("private/x"), F.lit("private/public/y"),
                        F.lit("tmp/z"), F.lit("open/page"), F.lit("drafts"),
                    ),
                    (F.pmod(F.col("doc_id"), F.lit(5)) + 1).cast("int"),
                ),
            ).alias("url"),
        )
        t0 = time.time()
        n_ok = filter_robots_allowed(urls, robots, user_agent="graftbot").count()
        dt = time.time() - t0
        row["robots_filter"] = {
            "urls_in": n,
            "urls_allowed": n_ok,
            "wall_s": round(dt, 2),
            "urls_per_sec": round(n / dt, 1),
        }

        # --- pagerank: 10 outlinks per node (edges = 10x docs), 10
        # iterations.  Per-iteration cost must be rank-table-sized: the
        # cached edge layout never re-exchanges (plan-pinned in
        # tests/test_graph.py), so wall per iteration should be flat in
        # iteration count and linear in edges.
        from data_stream_flink_user_address_spark.functions.graph import (
            pagerank,
        )

        n_nodes = n // 10
        edges = (
            spark.range(n_nodes * 10)
            .select(
                (F.col("id") % n_nodes).alias("src"),
                F.pmod(
                    F.col("id") * 2654435761 + F.col("id") % 97, F.lit(n_nodes)
                ).alias("dst"),
            )
        )
        t0 = time.time()
        total_rank = pagerank(edges, iters=10).agg(F.sum("rank")).collect()[0][0]
        dt = time.time() - t0
        row["pagerank"] = {
            "n_edges": n_nodes * 10,
            "n_nodes_ranked": n_nodes,
            "iters": 10,
            "rank_mass_error": round(abs(total_rank - n_nodes) / n_nodes, 8),
            "wall_s": round(dt, 2),
            "edges_x_iters_per_sec": round(n_nodes * 10 * 10 / dt, 1),
        }

        out["sizes"].append(row)
        print(json.dumps(row))

    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "R14_OPS_SCALE.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print("wrote R14_OPS_SCALE.json")


if __name__ == "__main__":
    main()
