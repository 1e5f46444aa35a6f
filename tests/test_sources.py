"""File readers + pages/link-extraction pipeline tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.sources import (
    build_web_graph,
    extract_links,
    extract_text,
    generate_pages,
    read_cluster_file,
    read_matrix_market_file,
    read_tsv_file,
    write_cluster_file,
)

MTX = """%%MatrixMarket matrix coordinate pattern general
% comment line
5 5 4
1 2
2 3
3 4
4 5
"""


def test_read_mtx(spark, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(MTX)
    g = read_matrix_market_file(spark, str(p))
    assert (g.n_vertices, g.n_edges) == (5, 4)


def test_read_tsv_weighted(spark, tmp_path):
    p = tmp_path / "g.tsv"
    p.write_text("1\t2\t3.5\n2\t3\t1.0\n")
    g = read_tsv_file(spark, str(p), weighted=True)
    assert g.n_edges == 2
    w = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    labels = {r["label"]: r["vid"] for r in g.vertices.collect()}
    assert w[(labels[1], labels[2])] == 3.5


def test_cluster_file_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 10), (2, 10), (3, 20)], "node long, cluster long")
    out = str(tmp_path / "clusters")
    write_cluster_file(df, out)
    back = read_cluster_file(spark, out)
    assert sorted(map(tuple, back.collect())) == [(1, 10), (2, 10), (3, 20)]


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, n_pages=300, links_per_page=6, seed=42).persist()


def test_pages_schema_and_determinism(spark, pages):
    assert dict(pages.dtypes) == {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    }
    assert pages.count() == 300
    # regenerating (different partitioning) gives byte-identical rows
    again = generate_pages(spark, n_pages=300, links_per_page=6, seed=42).repartition(7)
    h1 = sorted((r["url"], bytes(r["html"])) for r in pages.collect())
    h2 = sorted((r["url"], bytes(r["html"])) for r in again.collect())
    assert h1 == h2


def test_extract_text_byte_identical(pages):
    """input_hint invariant: extracted text per url is byte-identical to the
    generator's text column (hash check per FIXTURES.md)."""
    joined = (
        extract_text(pages)
        .withColumnRenamed("text", "extracted")
        .join(pages.select("url", "text"), "url")
    )
    mismatches = joined.filter(F.col("extracted") != F.col("text")).count()
    assert mismatches == 0
    digest = hashlib.sha256()
    for r in joined.orderBy("url").collect():
        digest.update(r["extracted"].encode())
    again = hashlib.sha256()
    for r in joined.orderBy("url").collect():
        again.update(r["text"].encode())
    assert digest.hexdigest() == again.hexdigest()


def test_extract_links_counts(pages):
    links = extract_links(pages)
    # every page emits links_per_page anchors (some duplicate/self)
    assert links.count() == 300 * 6
    assert links.filter(~F.col("href").startswith("https://site")).count() == 0


def test_build_web_graph(pages):
    g = build_web_graph(pages)
    assert g.directed
    assert g.n_vertices > 0 and g.n_edges > 0
    # no self-links survive canonicalization
    assert g.edges.filter(F.col("src") == F.col("dst")).count() == 0
    # hubs exist (skewed in-degree)
    indeg = g.in_degree()
    top = indeg.agg(F.max("in_degree")).collect()[0][0]
    assert top > 10


def test_canonicalize_url_rules(spark):
    from arkouda_njit_spark.sources import canonicalize_url

    cases = [
        ("  HTTP://WWW.Example.COM:80/Path/File#frag  ", "http://www.example.com/Path/File"),
        ("https://Host.example:443/", "https://host.example/"),
        ("https://host.example:8443/x", "https://host.example:8443/x"),
        ("HTTP://site1.example/pUpper#a#b", "http://site1.example/pUpper"),
        ("no-scheme/Path#f", "no-scheme/Path"),
        ("http://h.example:80", "http://h.example"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_build_web_graph_canonicalize_merges_variant_urls(spark):
    from arkouda_njit_spark.sources import build_web_graph
    from pyspark.sql import functions as F

    rows = [
        ("http://a.example/p1", b'<html><body><a href="HTTP://B.Example/p2#x">l</a>'
         b'<a href="http://b.example/p2">l</a></body></html>'),
        ("HTTP://B.Example:80/p2#ignored", b"<html><body></body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary").select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
        F.lit("").alias("text"), F.lit("en").alias("lang"),
    )
    g = build_web_graph(pages, num_partitions=2, canonicalize=True)
    verts = {r["url"] for r in g.vertices.collect()}
    assert verts == {"http://a.example/p1", "http://b.example/p2"}
    edges = g.edges.collect()
    assert len(edges) == 1 and edges[0]["weight"] == 2.0


def test_extract_links_null_html(spark):
    from arkouda_njit_spark.sources import extract_links
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [
            ("http://a.example/p", b'<a href="http://b.example/q">l</a>'),
            ("http://b.example/q", None),
        ],
        "url string, html binary",
    )
    rows = extract_links(pages).collect()
    assert [(r["url"], r["href"]) for r in rows] == [
        ("http://a.example/p", "http://b.example/q")
    ]


class TestLegacyGraphFile:
    """dev-tree graph_file_read / ToNDE writer / DegreeSort / RCM parity
    (client graph.py:1379-1421, GraphMsg.chpl:2320+)."""

    def _write(self, tmp_path, lines, name="g.nde"):
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_read_plain_and_weighted(self, spark, tmp_path):
        from arkouda_njit_spark.sources import read_graph_file

        p = self._write(tmp_path, ["1 5", "13 9", "7 6"])
        g = read_graph_file(spark, p)
        assert g.n_vertices == 6 and g.n_edges == 3 and not g.weighted
        pw = self._write(tmp_path, ["0 1 2.5", "1 2 0.5"], "w.nde")
        gw = read_graph_file(spark, pw)
        assert gw.weighted
        w = {(r["src_label"], r["dst_label"]): r["weight"]
             for r in gw.edge_list().collect()}
        assert w[(0, 1)] == 2.5 and w[(1, 2)] == 0.5

    def test_write_read_round_trip(self, spark, tmp_path):
        from arkouda_njit_spark.sources import read_graph_file, write_graph_file

        p = self._write(tmp_path, ["1 5", "13 9", "7 6", "5 13"])
        g = read_graph_file(spark, p)
        out = str(tmp_path / "exported")
        write_graph_file(g, out)
        g2 = read_graph_file(spark, out)
        assert sorted(tuple(r) for r in g.edge_list().collect()) == sorted(
            tuple(r) for r in g2.edge_list().collect()
        )

    def test_degree_sort_relabel(self, spark, tmp_path):
        from arkouda_njit_spark.sources import read_graph_file

        # star around 9 plus a pendant chain: degrees differ
        p = self._write(tmp_path, ["9 1", "9 2", "9 3", "9 4", "1 2", "7 1"])
        g = read_graph_file(spark, p, degree_sort=True)
        rows = (
            g.degree()
            .join(g.vertices, "vid")
            .orderBy("vid")
            .select("vid", "degree", "label")
            .collect()
        )
        degs = [r["degree"] for r in rows]
        assert degs == sorted(degs)  # vids ascend by degree
        # ties broken by original label, ascending
        for a, b in zip(rows, rows[1:]):
            if a["degree"] == b["degree"]:
                assert a["label"] < b["label"]
        # structure preserved: degree multiset unchanged
        g0 = read_graph_file(spark, p)
        assert sorted(degs) == sorted(
            r["degree"] for r in g0.degree().collect()
        )

    def test_rcm_relabel_bandwidth(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from arkouda_njit_spark.sources import read_graph_file

        # a path 0-1-2-...-7 written with scattered labels: RCM must
        # recover a banded ordering (bandwidth 1 on a path)
        import random

        rng = random.Random(5)
        perm = list(range(8))
        rng.shuffle(perm)
        lines = [f"{perm[i]} {perm[i+1]}" for i in range(7)]
        p = self._write(tmp_path, lines)
        g = read_graph_file(spark, p, rcm=True)
        bw = (
            g.edges.agg(F.max(F.abs(F.col("src") - F.col("dst")))).collect()[0][0]
        )
        assert bw == 1  # perfect path band; scattered labels would give >1
        # reversal property: the start (min-degree endpoint) gets the HIGHEST vid
        g_cm = read_graph_file(spark, p, rcm=False)
        assert g.n_vertices == g_cm.n_vertices == 8

    def test_rcm_unreachable_components_appended(self, spark, tmp_path):
        from arkouda_njit_spark.sources import read_graph_file

        p = self._write(tmp_path, ["0 1", "1 2", "10 11"])
        g = read_graph_file(spark, p, rcm=True)
        assert g.n_vertices == 5 and g.n_edges == 3
        # all vids still a dense 0..n-1 permutation
        vids = sorted(r["vid"] for r in g.vertices.collect())
        assert vids == list(range(5))


class TestWarc:
    """WARC source/sink: Common Crawl's on-disk format, stdlib gzip only."""

    def test_framing_round_trip_with_crlf_bodies(self):
        from arkouda_njit_spark.sources.warc import (
            _gzip_members,
            _parse_record,
            warc_encode,
        )

        recs = [
            ("https://a.example/p1", "2024-01-01T00:00:01Z", b"<html><p>hi</p></html>"),
            # body containing the record separator: Content-Length framing
            # must win over delimiter scanning
            ("https://b.example/p2", "2024-01-01T00:00:02Z", b"x\r\n\r\ny"),
            ("https://c.example/p3", "2024-01-01T00:00:03Z", b""),
        ]
        data = warc_encode(recs)
        assert [_parse_record(m) for m in _gzip_members(data)] == recs
        # archives concatenate (the property CC relies on)
        assert [_parse_record(m) for m in _gzip_members(data + data)] == recs + recs

    def test_non_response_records_skipped(self, spark, tmp_path):
        import gzip

        from arkouda_njit_spark.sources.warc import read_warc, warc_encode

        info = gzip.compress(
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n",
            mtime=0,
        )
        body = warc_encode(
            [("https://a.example/x", "2024-01-01T00:00:01Z", b"<html><p>t</p></html>")]
        )
        (tmp_path / "mixed.warc.gz").write_bytes(info + body)
        rows = read_warc(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        assert rows[0]["url"] == "https://a.example/x"
        assert rows[0]["text"] == "t"

    def test_spark_round_trip_preserves_pages_table(self, spark, tmp_path):
        """generate_pages -> write_warc -> read_warc reproduces the canonical
        pages table: byte-identical html per url (the input_hint invariant),
        equal extracted text, equal timestamps."""
        from arkouda_njit_spark.sources import generate_pages
        from arkouda_njit_spark.sources.warc import read_warc, write_warc

        pages = generate_pages(spark, n_pages=120, links_per_page=5, seed=42)
        manifest = write_warc(pages.repartition(4), str(tmp_path / "w")).collect()
        assert sum(r["n_records"] for r in manifest) == 120
        assert all(r["path"].endswith(".warc.gz") for r in manifest)

        back = read_warc(spark, str(tmp_path / "w"))
        a = {
            r["url"]: (bytes(r["html"]), r["warc_ts"])
            for r in pages.select("url", "html", "warc_ts").collect()
        }
        b = {
            r["url"]: (bytes(r["html"]), r["warc_ts"])
            for r in back.select("url", "html", "warc_ts").collect()
        }
        assert a == b

    def test_web_graph_from_warc_equals_direct(self, spark, tmp_path):
        """The graph built from WARC-ingested pages is identical to the graph
        built from the in-memory pages table."""
        from arkouda_njit_spark.sources import build_web_graph, generate_pages
        from arkouda_njit_spark.sources.warc import read_warc, write_warc

        pages = generate_pages(spark, n_pages=150, links_per_page=6, seed=7)
        write_warc(pages, str(tmp_path / "w")).collect()
        g1 = build_web_graph(pages)
        g2 = build_web_graph(read_warc(spark, str(tmp_path / "w")))
        e1 = sorted(map(tuple, g1.edge_list().collect()))
        e2 = sorted(map(tuple, g2.edge_list().collect()))
        assert e1 == e2


def test_warc_date_fractional_seconds(spark, tmp_path):
    """WARC 1.1 allows fractional seconds in WARC-Date (real Common Crawl
    archives carry them); the reader must parse, not silently null,
    warc_ts (round-4 ADVICE #3)."""
    from arkouda_njit_spark.sources.warc import read_warc, warc_encode

    body = warc_encode(
        [
            ("https://a.example/f", "2024-01-01T00:00:01.123456Z", b"<p>x</p>"),
            ("https://b.example/p", "2024-01-01T00:00:02Z", b"<p>y</p>"),
        ]
    )
    (tmp_path / "frac.warc.gz").write_bytes(body)
    rows = {r["url"]: r["warc_ts"] for r in read_warc(spark, str(tmp_path)).collect()}
    assert rows["https://a.example/f"] is not None
    assert rows["https://a.example/f"].second == 1
    assert rows["https://b.example/p"].second == 2


# -- anchor text ------------------------------------------------------------


def _anchor_pages(spark):
    rows = [
        (
            "https://a.example/1",
            (
                '<html><body><a href="https://T.example/x#frag">Spark <b>Graph</b> '
                'Engine</a><a href="https://t.example/x">graph engine!</a>'
                '<a href="https://other.example/">misc</a></body></html>'
            ).encode(),
        ),
        (
            "https://b.example/2",
            '<a href="https://t.example/x">ENGINE</a>'.encode(),
        ),
        (
            # self-link after canonicalization: excluded from the table
            "https://t.example/x",
            '<a href="https://t.example/x">me</a>'.encode(),
        ),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_anchors_strips_tags(spark):
    from arkouda_njit_spark.sources import extract_anchors

    rows = extract_anchors(_anchor_pages(spark)).collect()
    by = {(r["url"], r["href"]): r["anchor"] for r in rows}
    assert by[("https://a.example/1", "https://T.example/x#frag")] == (
        "Spark  Graph  Engine"
    )
    assert by[("https://b.example/2", "https://t.example/x")] == "ENGINE"
    assert len(rows) == 5


def test_anchor_text_table_topk(spark):
    from arkouda_njit_spark.sources import anchor_text_table

    tbl = anchor_text_table(_anchor_pages(spark), k=2).collect()
    tgt = [r for r in tbl if r["target"] == "https://t.example/x"]
    # counts: engine 3 (two pages, case/punct-normalized), graph 2,
    # spark 1, me excluded (self-link) — top-2 = engine, graph
    got = {(r["term"], r["cnt"], r["rank"]) for r in tgt}
    assert got == {("engine", 3, 1), ("graph", 2, 2)}
    # the fragment-bearing href canonicalized into the same target
    assert not any("frag" in r["target"] for r in tbl)


def test_anchor_table_on_generated_pages(spark, pages):
    from arkouda_njit_spark.sources import anchor_text_table

    tbl = anchor_text_table(pages, k=3)
    rows = tbl.collect()
    assert rows, "generated pages carry anchors"
    # generator anchors are all the single letter 'l'
    assert {r["term"] for r in rows} == {"l"}
    assert all(r["rank"] == 1 for r in rows)


class TestSnapshotDiff:
    """Crawl-snapshot edge diff + per-url content churn."""

    def test_snapshot_diff(self, spark):
        from arkouda_njit_spark.sources import snapshot_diff

        old = spark.createDataFrame(
            [(1, 2, 1.0), (1, 3, 2.0), (2, 3, 1.0)],
            "src long, dst long, weight double",
        )
        new = spark.createDataFrame(
            [(1, 2, 3.0), (2, 3, 1.0), (3, 4, 1.0)],
            "src long, dst long, weight double",
        )
        got = {
            (r["src"], r["dst"]): (r["status"], r["weight_old"], r["weight_new"], r["weight_delta"])
            for r in snapshot_diff(old, new).collect()
        }
        assert got == {
            (1, 2): ("persisted", 1.0, 3.0, 2.0),
            (1, 3): ("removed", 2.0, 0.0, -2.0),
            (2, 3): ("persisted", 1.0, 1.0, 0.0),
            (3, 4): ("added", 0.0, 1.0, 1.0),
        }

    def test_snapshot_diff_aggregates_dup_edges(self, spark):
        from arkouda_njit_spark.sources import snapshot_diff

        old = spark.createDataFrame(
            [(1, 2, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
        )
        new = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
        row = snapshot_diff(old, new).collect()[0]
        assert (row["status"], row["weight_old"], row["weight_delta"]) == ("persisted", 2.0, -1.0)

    def test_page_churn(self, spark):
        from arkouda_njit_spark.sources import page_churn

        old = spark.createDataFrame(
            [("a", "same text"), ("b", "old text"), ("c", "gone")],
            "url string, text string",
        )
        new = spark.createDataFrame(
            [("a", "same text"), ("b", "NEW text"), ("d", "fresh")],
            "url string, text string",
        )
        got = {r["url"]: r["status"] for r in page_churn(old, new).collect()}
        assert got == {"a": "unchanged", "b": "changed", "c": "removed", "d": "added"}
