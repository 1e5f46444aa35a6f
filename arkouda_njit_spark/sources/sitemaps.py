"""XML sitemap parsing (sitemaps.org protocol) for the crawl stack.

robots.txt (sources/robots.py) answers "may I fetch this url"; sitemaps
answer "which urls exist and when did they change" — the push half of
crawl scheduling, and the cheapest churn signal for the re-crawl loop
(``snapshot_diff`` / ``page_churn`` in sources/pages.py). This parses the
two public formats from sitemaps.org:

* ``<urlset>`` — page entries: loc, lastmod (W3C datetime, date-only
  allowed), changefreq, priority,
* ``<sitemapindex>`` — child-sitemap entries (loc, lastmod), flagged
  ``kind='sitemap'`` so a driver loop can enqueue them for fetching.

Gzipped bodies (``.xml.gz`` is standard for Common-Crawl-scale sitemaps)
are detected by magic bytes and inflated with stdlib ``gzip``. Parsing is
namespace-tolerant (tags compared after stripping ``{ns}`` prefixes) and
malformed XML yields zero rows for that document rather than failing the
batch — crawl inputs are adversarial.

Everything is one ``mapInPandas`` Arrow pass (per-document work only);
the lastmod cast to timestamp happens JVM-side afterwards with a lenient
multi-pattern ``coalesce`` — the WARC-date lesson: timestamps in crawl
data never come in exactly one shape.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTRY_SCHEMA = (
    "sitemap_url string, kind string, loc string, lastmod_raw string, "
    "changefreq string, priority double"
)


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _parse_one(url: str, body: bytes) -> list[tuple]:
    if body[:2] == b"\x1f\x8b":
        try:
            body = gzip.decompress(body)
        except OSError:
            return []
    try:
        root = ElementTree.parse(io.BytesIO(body)).getroot()
    except ElementTree.ParseError:
        return []
    root_tag = _strip_ns(root.tag)
    if root_tag == "sitemapindex":
        kind = "sitemap"
    elif root_tag == "urlset":
        kind = "url"
    else:
        return []
    rows = []
    for child in root:
        fields = {}
        for el in child:
            fields[_strip_ns(el.tag)] = (el.text or "").strip()
        loc = fields.get("loc")
        if not loc:
            continue
        prio = None
        if "priority" in fields:
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        rows.append(
            (url, kind, loc, fields.get("lastmod"), fields.get("changefreq"), prio)
        )
    return rows


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """Parse (url, body binary) sitemap documents into one row per entry:
    (sitemap_url, kind in {url, sitemap}, loc, lastmod timestamp,
    lastmod_raw, changefreq, priority)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for url, body in zip(pdf["url"], pdf["body"]):
                rows.extend(_parse_one(url, bytes(body) if body is not None else b""))
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url", "kind", "loc", "lastmod_raw",
                    "changefreq", "priority",
                ],
            )

    parsed = sitemaps.select("url", "body").mapInPandas(run, schema=_ENTRY_SCHEMA)
    # W3C datetime arrives in several shapes; parse leniently, never null a
    # value some pattern could have read (the WARC fractional-seconds lesson)
    raw = F.col("lastmod_raw")
    no_frac = F.regexp_replace(raw, r"\.\d+", "")
    lastmod = F.coalesce(
        F.try_to_timestamp(no_frac, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(no_frac, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd")),
    )
    return parsed.select(
        "sitemap_url", "kind", "loc", lastmod.alias("lastmod"),
        "lastmod_raw", "changefreq", "priority",
    )


def sitemap_urls(
    sitemaps: DataFrame,
    rules: DataFrame | None = None,
) -> DataFrame:
    """Deduplicated page urls announced by the sitemaps, newest lastmod and
    max priority per url — optionally with robots.txt admission
    (``rules`` = the output of ``parse_robots``; adds an ``allowed``
    boolean via ``robots_allowed``).

    Scale shape: one groupBy on the url (map-side combined); the robots
    join is per-host rules against url hosts — hosts are the natural
    pre-aggregated key, nothing fans out."""
    urls = (
        parse_sitemaps(sitemaps)
        .filter(F.col("kind") == "url")
        .groupBy("loc")
        .agg(
            F.max("lastmod").alias("lastmod"),
            F.max("priority").alias("priority"),
        )
        .withColumnRenamed("loc", "url")
    )
    if rules is None:
        return urls
    from .robots import robots_allowed

    return robots_allowed(urls, rules)
