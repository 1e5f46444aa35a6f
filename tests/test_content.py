"""Main-content extraction (jusText-family boilerplate removal) and
sitemap parsing for the crawl stack."""

import gzip

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions.content import (
    extract_main_content,
    extract_main_content_one,
)
from arkouda_njit_spark.sources.robots import parse_robots
from arkouda_njit_spark.sources.sitemaps import parse_sitemaps, sitemap_urls

ARTICLE = (
    "The committee said on Tuesday that it would review all of the "
    "evidence before making any decision about the proposal, because "
    "the matter was far from settled and many of those involved were "
    "still waiting for more information to be released."
)
PARA2 = (
    "She added that the report would be published when it was ready and "
    "that there was no reason to believe the timetable had changed in "
    "any way since the last update was given to the public."
)

PAGE = f"""<html><head><title>x</title>
<style>.nav {{ color: red }}</style>
<script>var tracking = "boilerplate noise words here";</script>
</head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<div><a href="/a">Latest</a> <a href="/b">Popular</a> <a href="/c">Tags</a></div>
<h1>Committee reviews proposal</h1>
<p>{ARTICLE}</p>
<p>{PARA2}</p>
<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a> Copyright 2026</footer>
</body></html>"""


class TestMainContent:
    def test_article_kept_boilerplate_dropped(self):
        text, n_blocks, n_good = extract_main_content_one(PAGE.encode())
        assert ARTICLE in text
        assert PARA2 in text
        assert "Home" not in text        # nav subtree killed
        assert "Privacy" not in text     # footer subtree killed
        assert "tracking" not in text    # script killed
        assert "color: red" not in text  # style killed
        assert 0 < n_good <= n_blocks

    def test_heading_inherits_good_from_neighbor(self):
        # context-free the <h1> is short/near; adjacency to the good <p>
        # pulls it in (jusText's neighbour expansion)
        text, _, _ = extract_main_content_one(PAGE.encode())
        assert "Committee reviews proposal" in text

    def test_link_farm_rejected(self):
        farm = "<p>" + " ".join(
            f'<a href="/{i}">the quick brown fox number {i}</a>' for i in range(30)
        ) + "</p>"
        text, _, n_good = extract_main_content_one(farm.encode())
        assert n_good == 0 and text == ""

    def test_pure_function_of_bytes(self):
        assert extract_main_content_one(PAGE.encode()) == extract_main_content_one(
            PAGE.encode()
        )

    def test_empty_and_garbage(self):
        assert extract_main_content_one(b"") == ("", 0, 0)
        assert extract_main_content_one(b"\xff\xfe garbage not html")[2] == 0

    def test_spark_path(self, spark):
        pages = spark.createDataFrame(
            [(f"http://ex.com/{i}", PAGE.encode()) for i in range(8)],
            "url string, html binary",
        ).repartition(3)
        out = extract_main_content(pages).collect()
        assert len(out) == 8
        assert all(ARTICLE in r["text"] for r in out)
        # deterministic across partitionings
        again = extract_main_content(pages.repartition(5)).collect()
        assert {r["url"]: r["text"] for r in out} == {
            r["url"]: r["text"] for r in again
        }


URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://ex.com/a</loc><lastmod>2026-01-15</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>http://ex.com/b</loc><lastmod>2026-02-01T10:30:00+00:00</lastmod></url>
  <url><loc>http://ex.com/c</loc><lastmod>2026-02-01T10:30:00.123Z</lastmod></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://ex.com/sitemap1.xml.gz</loc>
           <lastmod>2026-03-01</lastmod></sitemap>
</sitemapindex>"""


class TestSitemaps:
    def test_urlset_fields(self, spark):
        df = spark.createDataFrame(
            [("http://ex.com/sitemap.xml", URLSET)], "url string, body binary"
        )
        rows = {r["loc"]: r for r in parse_sitemaps(df).collect()}
        # the loc-less entry is dropped
        assert set(rows) == {"http://ex.com/a", "http://ex.com/b", "http://ex.com/c"}
        a = rows["http://ex.com/a"]
        assert a["kind"] == "url"
        assert a["changefreq"] == "daily"
        assert a["priority"] == pytest.approx(0.8)
        assert str(a["lastmod"]).startswith("2026-01-15")
        # tz-offset and fractional-second forms BOTH parse (lenient cast)
        assert rows["http://ex.com/b"]["lastmod"] is not None
        assert rows["http://ex.com/c"]["lastmod"] is not None

    def test_sitemapindex_and_gzip(self, spark):
        df = spark.createDataFrame(
            [
                ("http://ex.com/sitemap_index.xml", INDEX),
                ("http://ex.com/sitemap_gz.xml", gzip.compress(URLSET)),
                ("http://ex.com/broken.xml", b"<urlset><url><loc>x"),
            ],
            "url string, body binary",
        )
        rows = parse_sitemaps(df).collect()
        kinds = {(r["sitemap_url"], r["kind"]) for r in rows}
        assert ("http://ex.com/sitemap_index.xml", "sitemap") in kinds
        assert ("http://ex.com/sitemap_gz.xml", "url") in kinds
        # malformed document yields zero rows, not a batch failure
        assert not any(r["sitemap_url"] == "http://ex.com/broken.xml" for r in rows)
        assert len(rows) == 1 + 3

    def test_sitemap_urls_dedup_and_robots(self, spark):
        two = spark.createDataFrame(
            [
                ("http://ex.com/s1.xml", URLSET),
                ("http://ex.com/s2.xml", URLSET),  # same urls again
            ],
            "url string, body binary",
        )
        urls = sitemap_urls(two)
        assert urls.count() == 3  # deduplicated across sitemaps
        robots = spark.createDataFrame(
            [("ex.com", "User-agent: *\nDisallow: /a")], "host string, body string"
        )
        admitted = sitemap_urls(two, parse_robots(robots)).collect()
        flags = {r["url"]: r["allowed"] for r in admitted}
        assert flags["http://ex.com/a"] is False
        assert flags["http://ex.com/b"] is True
