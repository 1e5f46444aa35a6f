"""Crawl-frontier scheduling — the link-graph side of a crawler.

Given the pages already fetched, the frontier is the set of discovered
but unfetched URLs. Selecting the next batch is a pure DataFrame
problem with two web-specific constraints the naive ``ORDER BY score
LIMIT k`` ignores:

* **politeness** — no more than ``per_host`` URLs of one host per batch
  (a crawler must not hammer a single server), and
* **priority** — frontier URLs are worth different amounts; the standard
  cheap signal is in-link count (discovered-link indegree), optionally
  weighted by the linking page's score (OPIC-style cash splitting:
  every fetched page divides its score equally among its out-links, so
  a link from an important page is worth more).

Scale shape: the frontier score is one map-side-combined aggregation
over the extracted link table keyed by the candidate URL (a popular
unfetched URL's million in-links collapse to one row before the
shuffle); the politeness cap is a window over ``host`` — partitioned on
the host key, NOT a global sort — followed by a global top-``k`` on the
already-capped (≤ per_host × #hosts) survivor set. Nothing in the plan
holds raw fan-in as rows, and no stage sorts the full frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pages import canonicalize_url, extract_host, extract_links


def frontier_urls(pages: DataFrame, links: DataFrame | None = None) -> DataFrame:
    """Discovered-but-unfetched URLs with their discovery indegree:
    (url, host, n_inlinks). ``links`` defaults to Arrow-extracting from
    ``pages`` (pass a precomputed link table to reuse one extraction
    across frontier/anchor/graph builds)."""
    if links is None:
        links = extract_links(pages)
    fetched = pages.select(canonicalize_url(F.col("url")).alias("url")).distinct()
    return (
        links.select(canonicalize_url(F.col("href")).alias("url"))
        .groupBy("url")
        .agg(F.count("*").alias("n_inlinks"))
        .join(fetched, "url", "left_anti")
        .select("url", extract_host("url").alias("host"), "n_inlinks")
    )


def crawl_frontier(
    pages: DataFrame,
    k: int,
    per_host: int = 2,
    page_scores: DataFrame | None = None,
    links: DataFrame | None = None,
) -> DataFrame:
    """The next crawl batch: up to ``k`` frontier URLs, at most
    ``per_host`` per host, ranked by priority — (url, host, score, rank).

    Priority is the discovery indegree, or, when ``page_scores``
    (url, score — e.g. a PageRank over the fetched crawl) is given, the
    OPIC-style sum of each in-linking page's score divided by its
    out-degree. Deterministic: ties break on the URL string.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if per_host <= 0:
        raise ValueError(f"per_host must be positive, got {per_host}")
    if links is None:
        links = extract_links(pages)
    links = links.select(
        canonicalize_url(F.col("url")).alias("src"),
        canonicalize_url(F.col("href")).alias("url"),
    )
    fetched = pages.select(canonicalize_url(F.col("url")).alias("url")).distinct()
    if page_scores is not None:
        outdeg = links.groupBy(F.col("src").alias("url")).agg(
            F.count("*").alias("outdeg")
        )
        cash = (
            page_scores.select(canonicalize_url(F.col("url")).alias("src"), "score")
            .join(outdeg.withColumnRenamed("url", "src"), "src")
            .select("src", (F.col("score") / F.col("outdeg")).alias("cash"))
        )
        scored = (
            links.join(cash, "src")
            .groupBy("url")
            .agg(F.sum("cash").alias("score"))
        )
    else:
        scored = links.groupBy("url").agg(
            F.count("*").cast("double").alias("score")
        )
    cand = scored.join(fetched, "url", "left_anti").select(
        "url", extract_host("url").alias("host"), "score"
    )
    polite = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    capped = cand.withColumn("hrank", F.row_number().over(polite)).filter(
        F.col("hrank") <= per_host
    )
    # global top-k WITHOUT a single-partition sort of the capped frontier:
    # orderBy().limit(k) plans as TakeOrderedAndProject (per-partition
    # top-k, merged at the driver); the rank window then runs over the
    # <= k surviving rows only.
    batch = capped.orderBy(F.desc("score"), F.asc("url")).limit(k)
    top = Window.orderBy(F.desc("score"), F.asc("url"))
    return (
        batch.withColumn("rank", F.row_number().over(top))
        .select("url", "host", "score", "rank")
    )
