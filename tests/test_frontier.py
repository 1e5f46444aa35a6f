"""Crawl-frontier scheduling — politeness caps, indegree/OPIC priority,
determinism, and the generated-pages path."""

import pytest

from arkouda_njit_spark.sources import crawl_frontier, frontier_urls, generate_pages


def _pages(spark):
    # fetched: a.example/{1,2}, b.example/1.  Frontier candidates:
    #   new.example/{n1,n2,n3}  and  c.example/only
    def page(url, hrefs):
        html = "".join(f'<a href="{h}">l</a>' for h in hrefs)
        return (url, f"<html><body>{html}</body></html>".encode())

    rows = [
        page(
            "https://a.example/1",
            [
                "https://new.example/n1",
                "https://new.example/n2",
                "https://c.example/only",
                "https://a.example/2",  # fetched -> not frontier
            ],
        ),
        page(
            "https://a.example/2",
            ["https://new.example/n1", "https://new.example/n3"],
        ),
        page("https://b.example/1", ["https://new.example/n1#frag"]),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_frontier_urls_indegree(spark):
    fr = {r["url"]: r for r in frontier_urls(_pages(spark)).collect()}
    # canonicalization folds the #frag into n1 -> indegree 3
    assert fr["https://new.example/n1"]["n_inlinks"] == 3
    assert fr["https://new.example/n2"]["n_inlinks"] == 1
    assert fr["https://c.example/only"]["host"] == "c.example"
    assert "https://a.example/2" not in fr  # fetched
    assert len(fr) == 4


def test_politeness_cap_and_ranking(spark):
    batch = crawl_frontier(_pages(spark), k=10, per_host=1).collect()
    by_host = {}
    for r in batch:
        by_host.setdefault(r["host"], []).append(r)
    assert all(len(v) <= 1 for v in by_host.values())
    # n1 (indegree 3) must be new.example's pick and the global rank-1
    assert by_host["new.example"][0]["url"] == "https://new.example/n1"
    assert by_host["new.example"][0]["rank"] == 1
    assert len(batch) == 2  # one per host: new.example + c.example

    # k cuts the batch after ranking
    assert len(crawl_frontier(_pages(spark), k=1, per_host=1).collect()) == 1


def test_opic_scoring_prefers_links_from_important_pages(spark):
    pages = _pages(spark)
    spark_df = pages.sparkSession.createDataFrame(
        [
            ("https://a.example/1", 0.1),
            ("https://a.example/2", 0.1),
            ("https://b.example/1", 9.0),  # b is important
        ],
        "url string, score double",
    )
    batch = {
        r["url"]: r["score"]
        for r in crawl_frontier(pages, k=10, per_host=5, page_scores=spark_df)
        .collect()
    }
    # n1: 0.1/4 + 0.1/2 + 9.0/1 = 9.075 ; n3: 0.1/2 ; n2: 0.1/4
    assert batch["https://new.example/n1"] == pytest.approx(9.075)
    assert batch["https://new.example/n3"] == pytest.approx(0.05)
    assert batch["https://new.example/n2"] == pytest.approx(0.025)


def test_frontier_on_generated_pages_deterministic(spark):
    from pyspark.sql import functions as F

    # crawl only 2/3 of the universe so in-universe links form a frontier
    pages = generate_pages(spark, n_pages=300, seed=5).filter(
        F.xxhash64("url") % 3 != 0
    )
    a = crawl_frontier(pages, k=20, per_host=2).collect()
    b = crawl_frontier(pages.repartition(7), k=20, per_host=2).collect()
    assert a, "subset crawl must leave a non-empty frontier"
    assert [r["url"] for r in a] == [r["url"] for r in b]
    hosts = {}
    for r in a:
        hosts[r["host"]] = hosts.get(r["host"], 0) + 1
    assert all(c <= 2 for c in hosts.values())

    with pytest.raises(ValueError):
        crawl_frontier(pages, k=0)
    with pytest.raises(ValueError):
        crawl_frontier(pages, k=5, per_host=0)
