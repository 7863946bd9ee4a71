"""Crawl-frontier demo: sitemap discovery -> canonical frontier ->
robots politeness -> link-graph prioritization.

Composes the web-discovery surface end to end on synthetic inputs:

1. parse_sitemaps: a sitemapindex fans out to child urlsets; both
   parse row-locally, nested references come out as kind='sitemap';
2. normalize_url + first-seen dedup build the canonical frontier;
3. filter_robots_allowed drops what RFC 9309 forbids for our agent;
4. domain_pagerank over already-fetched pages scores each domain's
   link-graph reputation, and the frontier is ordered by it -- the
   fetch queue a polite, quality-weighted crawler would actually run.

Run: ``python examples/run_crawl_frontier.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.graph import domain_pagerank
from data_stream_flink_user_address_spark.functions.web import (
    domain_of,
    filter_robots_allowed,
    normalize_url,
    parse_sitemaps,
)
from data_stream_flink_user_address_spark.session import get_spark

SITES = ["hub.example", "mid.example", "leaf.example"]


def _urlset(host: str, n: int) -> str:
    urls = "".join(
        f"<url><loc>https://{host}/page/{i}?utm_source=sitemap</loc>"
        f"<priority>0.{5 + i % 5}</priority></url>"
        for i in range(n)
    )
    return f'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{urls}</urlset>'


def main() -> None:
    spark = get_spark("crawl-frontier")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. sitemap discovery: one index per site + its child urlset
    index_xml = lambda host: (  # noqa: E731
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<sitemap><loc>https://{host}/sitemap-pages.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    fetched = spark.createDataFrame(
        [Row(sitemap_url=f"https://{h}/sitemap.xml", sitemap_xml=index_xml(h))
         for h in SITES]
        + [Row(sitemap_url=f"https://{h}/sitemap-pages.xml",
               sitemap_xml=_urlset(h, 8)) for h in SITES]
    )
    entries = parse_sitemaps(fetched)
    n_nested = entries.filter(F.col("kind") == "sitemap").count()

    # 2. canonical frontier: normalize (tracking params drop) + first-seen
    pages = entries.filter(F.col("kind") == "url").select(
        normalize_url("loc").alias("url"), "priority"
    )
    w = Window.partitionBy("url").orderBy(F.col("priority").desc_nulls_last())
    frontier = (
        pages.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 3. politeness: leaf.example disallows its /page/ tree entirely
    robots = spark.createDataFrame([
        Row(domain="leaf.example",
            robots_txt="User-agent: *\nDisallow: /page/"),
        Row(domain="hub.example", robots_txt="User-agent: *\nDisallow:"),
    ])
    polite = filter_robots_allowed(frontier, robots, user_agent="graftbot")

    # 4. prioritize by domain reputation from pages already fetched:
    # mid + leaf both link to hub; hub links to mid only
    page = lambda u, links: Row(url=u, html="".join(  # noqa: E731
        f'<a href="{x}">l</a>' for x in links
    ))
    crawled = spark.createDataFrame([
        page("https://mid.example/a", ["https://hub.example/x"]),
        page("https://leaf.example/b",
             ["https://hub.example/y", "https://mid.example/c"]),
        page("https://hub.example/x", ["https://mid.example/c"]),
    ])
    ranks = domain_pagerank(crawled, iters=15)
    queue = (
        polite.withColumn("domain", domain_of("url"))
        .join(ranks, "domain", "left")
        .orderBy(F.col("rank").desc_nulls_last(), "url")
    )

    print(f"sitemap entries: {entries.count()} "
          f"({n_nested} nested sitemap refs expanded)")
    print(f"canonical frontier: {frontier.count()} URLs; "
          f"after robots: {polite.count()}")
    print("fetch queue (domain-rank ordered):")
    for r in queue.select("url", "rank").limit(6).collect():
        rank = f"{r.rank:.3f}" if r.rank is not None else "  n/a"
        print(f"  {rank}  {r.url}")


if __name__ == "__main__":
    main()
