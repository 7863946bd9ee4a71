"""WARC-to-corpus ingestion demo: crawl archives in, clean documents out.

Composes the web-ingestion surface end to end on synthetic WARC files
(the ISO 28500 framing, generated here so the demo is hermetic):

1. read_warc: binaryFile -> mapInPandas record split (responses only);
2. URL canonicalization: tracking params / fragments / case collapse,
   then URL-identity dedup (first fetch wins);
3. domain blocklist (broadcast anti-join, subdomains included);
3b. robots.txt politeness (RFC 9309 longest-match, broadcast rules);
4. main-content extraction (block link-density: the nav chrome
   drops here) -> markup strip -> text corpus;
5. MinHash near-dup removal across the fetched pages;
6. corpus_profile funnel report at every stage.

Run: ``python examples/run_web_crawl_ingest.py`` (writes under
/tmp/spark_graft_crawl).
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.dedup import (
    dedup_clusters,
    lsh_candidate_pairs,
    minhash_signatures_text,
)
from data_stream_flink_user_address_spark.functions.profile import profile_funnel
from data_stream_flink_user_address_spark.functions.text import (
    extract_main_content,
    strip_markup,
)
from data_stream_flink_user_address_spark.functions.web import (
    filter_blocked_domains,
    filter_robots_allowed,
    normalize_url,
    read_warc,
)
from data_stream_flink_user_address_spark.session import get_spark

OUT = "/tmp/spark_graft_crawl"
N_PAGES = 300


def _host(i: int) -> bytes:
    if i % 11 == 0:
        return b"spam.blocked.example"
    return b"site%d.example" % (i % 5)


def _page_html(i: int) -> bytes:
    # per-page distinct vocabulary so honest pages are NOT near-dups of
    # each other (only the planted i%13 pairs are)
    words = " ".join(f"w{(i * 37 + k * k) % 9973}" for k in range(40))
    body = (
        f"<html><head><title>Page {i}</title></head><body>"
        f"<h1>Article {i}</h1><p>{words}</p>"
        "<div class=nav>home | about | contact</div></body></html>"
    )
    return body.encode()


def _mk_warcs(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    sep = b"\r\n"

    def rec(uri: bytes, body: bytes) -> bytes:
        h = b"WARC/1.0" + sep
        h += b"WARC-Type: response" + sep
        h += b"WARC-Target-URI: " + uri + sep
        h += b"WARC-Date: 2026-02-01T00:00:00Z" + sep
        h += b"Content-Length: " + str(len(body)).encode() + sep
        return h + sep + body + sep + sep

    for shard in range(3):
        blob = b""
        for j in range(N_PAGES // 3):
            i = shard * (N_PAGES // 3) + j
            # every 9th page: the PREVIOUS page refetched with tracking
            # params (same host, same content -- the URL-dedup case)
            if i % 9 == 1:
                uri = b"https://%s/article/%d?utm_source=feed" % (
                    _host(i - 1), i - 1,
                )
                body = _page_html(i - 1)
            else:
                uri = b"https://%s/article/%d" % (_host(i), i)
                body = _page_html(i)
            # every 13th page: near-duplicate CONTENT at a distinct URL
            # (one word changed -- the MinHash case)
            if i % 13 == 2 and i % 9 != 1:
                body = _page_html(i - 1).replace(b" w", b" v", 1)
            blob += rec(uri, body)
        with open(os.path.join(path, f"crawl-{shard}.warc"), "wb") as f:
            f.write(blob)


def main() -> None:
    spark = get_spark("web-crawl-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)
    warc_dir = os.path.join(OUT, "warcs")
    _mk_warcs(warc_dir)

    recs = read_warc(spark, warc_dir)
    docs = recs.select(
        normalize_url("url").alias("url"),
        F.decode("payload", "utf-8").alias("html"),
    ).withColumn("doc_id", F.abs(F.xxhash64("url")))

    # URL-identity dedup: the tracking-param refetches collapse here
    w = Window.partitionBy("url").orderBy("doc_id")
    by_url = docs.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")

    unblocked = filter_blocked_domains(by_url, spark.createDataFrame(
        [("blocked.example",)], ["domain"]
    ))

    # politeness: site0 disallows its /article/ tree to everyone,
    # site1 disallows it for OTHER agents but allows our crawler
    robots = spark.createDataFrame(
        [
            ("site0.example", "User-agent: *\nDisallow: /article/"),
            ("site1.example",
             "User-agent: graftbot\nAllow: /\n"
             "User-agent: *\nDisallow: /article/"),
        ],
        ["domain", "robots_txt"],
    )
    polite = filter_robots_allowed(unblocked, robots, user_agent="graftbot")

    # main-content extraction: the per-page nav chrome drops here.
    # content/text feed the funnel AND the dedup chain AND the final
    # write -- lazy checkpoints stop the pandas-UDF extractor from
    # re-running per reference (multi-ref recompute pitfall); pages
    # whose every block was chrome leave the corpus entirely
    content = extract_main_content(polite, text_col="html").select(
        "doc_id", F.col("text").alias("html")
    ).localCheckpoint(eager=False)
    text = (
        strip_markup(content, text_col="html")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
        .join(polite.select("doc_id", "url"), "doc_id")
        .localCheckpoint(eager=False)
    )

    sigs = minhash_signatures_text(text, num_hashes=16)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    clusters = dedup_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    final = text.join(drop, "doc_id", "left_anti")

    funnel = profile_funnel(
        {
            "fetched": docs.select("doc_id", F.col("html").alias("text")),
            "url_deduped": by_url.select("doc_id", F.col("html").alias("text")),
            "unblocked": unblocked.select("doc_id", F.col("html").alias("text")),
            "robots_ok": polite.select("doc_id", F.col("html").alias("text")),
            "main_content": content.select("doc_id", F.col("html").alias("text")),
            "near_dedup": final,
        }
    )
    final.write.mode("overwrite").parquet(os.path.join(OUT, "corpus"))

    n_records = recs.count()
    print(f"WARC records fetched: {n_records}")
    for r in funnel.collect():
        print(
            f"  {r.stage:>11}: {r.n_docs} docs, {r.total_tokens} tokens, "
            f"dup-rate {r.approx_dup_rate}"
        )
    print(f"clean corpus written under {OUT}/corpus")


if __name__ == "__main__":
    main()
