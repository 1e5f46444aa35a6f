"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2 + the
training-data-pipeline suite) over the driver's parquet tables;
``oracle_sql()`` gives DuckDB-replayable ANSI SQL for every query (45/45).
Hash-family ops (MinHash, SimHash) use md5 so any engine can replay them;
xxhash64-derived constants that are data-INDEPENDENT (LSH hyperplanes,
synthetic-generator draws) are replayed host-side through the pure-Python
XXH64 port (functions/xxh64.py, bit-exact vs Spark by test) and inlined
into the SQL as literals — the oracle recomputes everything
data-dependent itself.

Derived graphs (deterministic, identical in both engines, label space):
  * graph A — bipartite part–supplier: (l_partkey) -- (100000+l_suppkey)
    distinct pairs from lineitem; used for degree/pagerank/cc/lpa/bfs.
  * graph B — mod graph: (l_orderkey%301) -- (l_partkey%301), self-loops
    dropped; non-bipartite, used for triangles/squares.

Floats are rounded in-query on BOTH sides (the driver hashes values).
All aliases are lowercase (DuckDB lowercases unquoted identifiers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.functions import (
    ann_lsh_topk,
    cosine_topk,
    exact_duplicates,
    extract_features,
    fingerprint,
    generate_media,
    language_id,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    token_count,
)
from arkouda_njit_spark.operators import (
    bfs_layers,
    connected_components,
    label_propagation,
    louvain_communities,
    pagerank,
    squares,
    triangle_count,
    triangles_per_vertex,
)
from arkouda_njit_spark.sources import complete_graph, generate_pages, build_web_graph
from arkouda_njit_spark.streaming import sessionize

# ---------------------------------------------------------------------------
# shared builders (memoized per sf_dir)
# ---------------------------------------------------------------------------

_CACHE: dict = {}

# The driver may hand us a vanilla session: pin the confs correctness
# depends on (UTC for timestamp-string parity with DuckDB) and a sane
# partition count for the small test tables (the default 200 just adds
# scheduling overhead at sf<=0.1).
_GRAPH_PARTITIONS = 16


def _tune(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The driver hands us ITS session, which on stock Spark 4 means AQE on
    # and 200 shuffle partitions. At sf0.01 both hurt badly, measured on
    # triangle_centrality: AQE re-plans the hinted shuffle_hash wedge joins
    # around the cached exchanges (172 s vs 14.8 s with AQE off!), and 200
    # partitions pay ~12x task overhead per tiny stage. Pin both for the
    # correctness workload; bench/tests build their own session via
    # get_spark (AQE on, 64 MB broadcast threshold) where the big-data
    # trade-offs are the opposite.
    spark.conf.set("spark.sql.shuffle.partitions", str(_GRAPH_PARTITIONS))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return spark


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    _tune(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def q_relabel(spark, sf_dir):
    """BOTH legacy relabel operators in one driver row (round-5 registry
    consolidation), tagged by a ``method`` column:

    * ``degree_sort`` — DegreeSortFlag relabel on graph A: new vids ascend
      by (degree, label) — dev-tree graph_file_read's degree-sorted remap
      (GraphMsg.chpl segGraphFileMsg), Spark-first as one composite dense
      rank + two remap joins (sources/files.py:degree_sort_relabel).
    * ``rcm`` — RCMFlag relabel (level-set reverse Cuthill-McKee,
      sources/files.py:rcm_relabel) on a deterministic caterpillar (path
      0..11 with pendant leaves on even spine vertices) plus an isolated
      triangle component: varying degrees exercise the (level, degree,
      label) tie-breaks, and the second component exercises the
      unreachable-appended branch. Oracle = 14 unrolled min-distance
      relaxation rounds + a window rank, reversed."""
    _tune(spark)
    from arkouda_njit_spark.sources import degree_sort_relabel, rcm_relabel

    ds = degree_sort_relabel(_graph_a(spark, sf_dir)).vertices.select(
        F.lit("degree_sort").alias("method"),
        F.col("vid").cast("long"),
        F.col("label").cast("long"),
    )
    spine = spark.range(12).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    leaves = (
        spark.range(12)
        .filter(F.col("id") % 2 == 0)
        .select(F.col("id").alias("src"), (F.col("id") + 50).alias("dst"))
    )
    tri = spark.createDataFrame(
        [(100, 101), (101, 102), (102, 100)], "src long, dst long"
    )
    edges = spine.unionAll(leaves).unionAll(tri).withColumn("weight", F.lit(1.0))
    g = rcm_relabel(Graph.from_edges(spark, edges, num_partitions=_GRAPH_PARTITIONS))
    rcm = g.vertices.select(
        F.lit("rcm").alias("method"),
        F.col("vid").cast("long"),
        F.col("label").cast("long"),
    )
    return ds.unionByName(rcm)


def _graph_a(spark: SparkSession, sf_dir: str) -> Graph:
    key = ("a", sf_dir)
    if key not in _CACHE:
        li = _read(spark, sf_dir, "lineitem")
        raw = li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        _CACHE[key] = Graph.from_edges(spark, raw, num_partitions=_GRAPH_PARTITIONS)
    return _CACHE[key]


def _graph_b(spark: SparkSession, sf_dir: str) -> Graph:
    key = ("b", sf_dir)
    if key not in _CACHE:
        li = _read(spark, sf_dir, "lineitem")
        raw = li.select(
            F.pmod(F.col("l_orderkey"), F.lit(301)).alias("src"),
            F.pmod(F.col("l_partkey"), F.lit(301)).alias("dst"),
            F.lit(1.0).alias("weight"),
        ).filter(F.col("src") != F.col("dst"))
        _CACHE[key] = Graph.from_edges(spark, raw, num_partitions=_GRAPH_PARTITIONS)
    return _CACHE[key]


def _labels(g: Graph) -> DataFrame:
    return g.vertices.select("vid", F.col("label").alias("node"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic duplicate slices (doc_id, text only).

    The synthetic corpus has no duplicate docs, so exact_dups /
    ngram_jaccard were vacuously green on 0 rows (round-3 verdict #3).
    Same trick as _emb_with_dups: doc_id%20==0 → +1000000 byte-identical
    copy (exact-dup pairs); doc_id%20==5 → +2000000 copy with one appended
    token (high-but-<1 n-gram Jaccard pairs)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 20 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" neardup tail")).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


# ---------------------------------------------------------------------------
# entry — flagship smoke query
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: canonical edge-table build → PageRank → top-20 vertices by
    rank (sf0.001). Exercises source → canonicalization (shuffle + dense
    remap) → iterative kernel → top-k."""
    sf_dir = "/root/testdata/sf0.001"
    g = _graph_a(spark, sf_dir)
    pr = pagerank(g, max_iterations=30)
    return (
        pr.join(_labels(g), "vid")
        .select("node", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------


def q_build_edges(spark, sf_dir):
    """Canonical weighted edge table of graph A in label space (u<v)."""
    g = _graph_a(spark, sf_dir)
    lab = _labels(g)
    return (
        g.edges.filter(F.col("src") < F.col("dst"))
        .join(lab.withColumnRenamed("vid", "src").withColumnRenamed("node", "u"), "src")
        .join(lab.withColumnRenamed("vid", "dst").withColumnRenamed("node", "v"), "dst")
        .select(
            F.col("u").cast("long"),
            F.col("v").cast("long"),
            F.col("weight").cast("double").alias("weight"),
        )
    )


def q_degree(spark, sf_dir):
    """Undirected degree() AND DiGraph out_degree() in one row per node
    (merged round 4 so both stay inside the driver's correctness window)."""
    g = _graph_a(spark, sf_dir)
    deg = (
        g.degree()
        .join(_labels(g), "vid")
        .select(F.col("node").cast("long"), F.col("degree").cast("long"))
    )
    li = _read(spark, sf_dir, "lineitem")
    dg = DiGraph.from_edges(
        spark,
        li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
        num_partitions=_GRAPH_PARTITIONS,
    )
    od = (
        dg.out_degree()
        .join(dg.vertices.select("vid", F.col("label").alias("node")), "vid")
        .select(F.col("node").cast("long"), F.col("out_degree").cast("long"))
    )
    return deg.join(od, "node")


def q_density(spark, sf_dir):
    g = _graph_a(spark, sf_dir)
    return spark.createDataFrame(
        [(g.n_vertices, g.n_edges, round(g.density(), 9))],
        "n_vertices long, n_edges long, density double",
    )


def q_triangle_count(spark, sf_dir):
    g = _graph_b(spark, sf_dir)
    return spark.createDataFrame([(triangle_count(g),)], "triangles long")


def q_squares(spark, sf_dir):
    g = _graph_b(spark, sf_dir)
    return spark.createDataFrame([(squares(g),)], "squares long")


def q_pagerank5(spark, sf_dir):
    g = _graph_a(spark, sf_dir)
    pr = pagerank(g, alpha=0.85, tol=0.0, max_iterations=5)
    return (
        pr.join(_labels(g), "vid")
        .select(F.col("node").cast("long"), F.round("rank", 9).alias("rank"))
    )


def q_pagerank3_weighted(spark, sf_dir):
    """Weighted PageRank (weight = edge multiplicity from duplicate-row
    summing) — covers the w/out_weight_total transition path the
    unweighted oracle cannot see."""
    g = _graph_a(spark, sf_dir)
    pr = pagerank(g, alpha=0.85, tol=0.0, max_iterations=3, weight="weight")
    return (
        pr.join(_labels(g), "vid")
        .select(F.col("node").cast("long"), F.round("rank", 9).alias("rank"))
    )


def q_connected_components(spark, sf_dir):
    """Per-node component label plus the component's size (the round-3
    component_sizes query folded in as a column — one driver row covers
    both the labelling and the size aggregation)."""
    g = _graph_a(spark, sf_dir)
    comps = connected_components(g)
    lab = _labels(g)
    comp_lab = lab.select(
        F.col("vid").alias("component"), F.col("node").alias("component_label")
    )
    cc = (
        comps.join(lab, "vid")
        .join(comp_lab, "component")
        .select(
            F.col("node").cast("long"),
            F.col("component_label").cast("long").alias("component"),
        )
    )
    sizes = cc.groupBy("component").agg(F.count("*").cast("long").alias("size"))
    return cc.join(sizes, "component").select("node", "component", "size")


def q_lpa4(spark, sf_dir):
    g = _graph_a(spark, sf_dir)
    lp = label_propagation(g, max_iterations=4)
    lab = _labels(g)
    lab_of = lab.select(F.col("vid").alias("label"), F.col("node").alias("community"))
    return (
        lp.join(lab, "vid")
        .join(lab_of, "label")
        .select(F.col("node").cast("long"), F.col("community").cast("long").alias("label"))
    )


def q_bfs(spark, sf_dir):
    """BFS hop depth (operators/bfs.py) PLUS weighted shortest-path
    distance (operators/sssp.py, frontier label-correcting) from the same
    min-label source of undirected graph A — merged into one slot
    (round-5 registry consolidation; both are single-source distance
    vectors of the same graph, and graph A's summed duplicate weights
    make the two genuinely differ). Oracle = recursive-CTE BFS plus an
    unrolled Bellman–Ford fixpoint."""
    from arkouda_njit_spark.operators import shortest_paths

    g = _graph_a(spark, sf_dir)
    source = g.vertices.agg(F.min("label")).collect()[0][0]
    wdist = shortest_paths(g, source).select("vid", "dist")
    return (
        bfs_layers(g, source)
        .join(wdist, "vid", "left")
        .join(_labels(g), "vid")
        .select(
            F.col("node").cast("long"),
            F.col("depth").cast("long"),
            F.round(F.coalesce("dist", F.lit(-1.0)), 6).alias("wdist"),
        )
    )


def q_complete_graph(spark, sf_dir):
    _tune(spark)
    return complete_graph(spark, 8).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


# ---------------------------------------------------------------------------
# documents / text queries
# ---------------------------------------------------------------------------


def q_text_stats(spark, sf_dir):
    """token_count + quality_score + language_id + shingle fingerprint +
    Okapi BM25 for the fixed query "data quality web"
    (functions/retrieval.py) in ONE row per document (round-5 registry
    consolidation — all five are doc_id-keyed pipelines over the same
    table). Oracle replays the BM25 postings/df/dl algebra in SQL."""
    from arkouda_njit_spark.functions import bm25

    docs = _docs(spark, sf_dir)
    scores = bm25(docs, "data quality web").select(
        "doc_id", F.col("score").alias("_bm25")
    )
    return (
        fingerprint(language_id(quality_score(token_count(docs))), n=3)
        .join(scores, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long"),
            F.col("n_tokens").cast("long"),
            F.round("quality", 6).alias("quality"),
            F.col("lang_pred"),
            F.col("fingerprint"),
            F.round(F.coalesce("_bm25", F.lit(0.0)), 9).alias("bm25_dqw"),
        )
    )


def q_exact_dups(spark, sf_dir):
    return exact_duplicates(_docs_with_dups(spark, sf_dir)).select(
        "content_hash",
        F.col("n_docs").cast("long"),
        F.array_join("doc_ids", ",").alias("doc_ids_csv"),
    )


def q_louvain(spark, sf_dir):
    """Louvain communities on a deterministic ring of cliques (12 cliques
    of 12 vertices, single bridge edges): the modularity optimum is exactly
    the cliques (the resolution limit needs ~sqrt(2m) ≈ 40 cliques before
    merged pairs win), and the engine's canonical label is each clique's
    minimum vid — a mathematical oracle computed end-to-end by the
    distributed kernel (operators/louvain.py). Generated-graph query like
    complete_graph: the input is identical in both engines by construction.
    """
    n_cliques, size = 12, 12
    edges = [
        (b * size + a, b * size + c)
        for b in range(n_cliques)
        for a in range(size)
        for c in range(size)
        if a < c
    ]
    edges += [(b * size, ((b + 1) % n_cliques) * size + 1) for b in range(n_cliques)]
    df = spark.createDataFrame(edges, "src long, dst long").withColumn(
        "weight", F.lit(1.0)
    )
    g = Graph.from_edges(spark, df, weighted=True)
    return louvain_communities(g, max_sweeps=12).select(
        F.col("vid").cast("long"), F.col("community").cast("long")
    )


def _clean_ascii(col, n):
    """Lowercase a-z+space prefix of length n — identical semantics in Spark
    and DuckDB regex engines (no lookarounds; RE2-safe)."""
    return F.substring(F.regexp_replace(F.lower(col), "[^a-z ]", ""), 1, n)


def q_strings(spark, sf_dir):
    """Suffix arrays AND longest-common-substring in one doc_id-keyed row
    (round-5 registry consolidation; both dev-tree string kernels,
    SuffixArrayMsg.chpl / LCSMsg.chpl parity):

    * per-document suffix array over a 25-doc sample, strings sanitized to
      48 ASCII chars so Python codepoint order == DuckDB byte order,
      CSV-stringified (the driver's canonicalizer cannot hash lists);
    * LCS between doc d and doc d+10 on 32-char sanitized strings
      ('' where the d+10 partner is missing)."""
    from arkouda_njit_spark.functions import longest_common_substring, suffix_array

    docs = _docs(spark, sf_dir)
    sa_docs = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").cast("long"), _clean_ascii(F.col("text"), 48).alias("s")
    )
    sa = suffix_array(sa_docs, col="s").select(
        "doc_id", F.concat_ws(",", F.col("suffix_array")).alias("suffix_array_csv")
    )
    a = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").cast("long"), _clean_ascii(F.col("text"), 32).alias("a")
    )
    b = docs.filter(F.col("doc_id") % 20 == 10).select(
        (F.col("doc_id").cast("long") - 10).alias("doc_id"),
        _clean_ascii(F.col("text"), 32).alias("b"),
    )
    lcs = longest_common_substring(a.join(b, "doc_id"), "a", "b").select(
        "doc_id", "lcs"
    )
    return sa.join(lcs, "doc_id", "left").na.fill({"lcs": ""})


def q_ngram_jaccard(spark, sf_dir):
    docs = _docs_with_dups(spark, sf_dir).filter(F.col("doc_id") % 1000000 < 100)
    return ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.5).select(
        F.col("a").cast("long"),
        F.col("b").cast("long"),
        F.round("jaccard", 9).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# embeddings / events queries
# ---------------------------------------------------------------------------


def q_embedding_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries, k=5).select(
        F.col("query_id").cast("long"),
        F.col("vec_id").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )


def q_ann_ivf_exhaustive(spark, sf_dir):
    """IVF ANN with nprobe == nlist (exhaustive probing): must equal the
    exact brute-force top-k, so the quantizer + probe + rerank pipeline is
    fully oracle-checked; the nprobe < nlist scale path is covered by the
    pytest recall test."""
    from arkouda_njit_spark.functions import ann_ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_ivf_topk(emb, queries, dim=dim, k=5, nlist=8, nprobe=8).select(
        F.col("query_id").cast("long"),
        F.col("vec_id").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )


def q_events_rollup(spark, sf_dir):
    """Hourly per-type aggregation AND per-type top-3 users in one driver
    row (round-5 registry consolidation), tagged by ``section``:
    ('hourly', hour_start, event_type, count, total) ∪
    ('top', event_type, user_id, rank, total)."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    ).select(
        F.lit("hourly").alias("section"),
        F.col("hour_start").alias("k1"),
        F.col("event_type").alias("k2"),
        "n",
        "total_value",
    )
    totals = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.col("user_id")
    )
    top = (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.lit("top").alias("section"),
            F.col("event_type").alias("k1"),
            F.col("user_id").cast("string").alias("k2"),
            F.col("rank").cast("long").alias("n"),
            "total_value",
        )
    )
    return hourly.unionByName(top)


def q_sessionize(spark, sf_dir):
    ev = _read(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return sessionize(ev, gap="30 minutes").select(
        F.col("user_id").cast("long"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.col("n_events").cast("long"),
    )


# ---------------------------------------------------------------------------
# LSH / ANN / multimodal / web-pipeline queries (oracled like everything
# else — md5 hash families + host-side XXH64 replay of data-independent
# constants; see the module docstring)
# ---------------------------------------------------------------------------


def q_minhash_near_dups(spark, sf_dir):
    return minhash_near_duplicates(
        _docs(spark, sf_dir), num_hashes=16, bands=8, shingle_n=3, threshold=0.7
    ).select(
        F.col("a").cast("long"),
        F.col("b").cast("long"),
        F.round("jaccard", 9).alias("jaccard"),
    )


def q_simhash(spark, sf_dir):
    return simhash(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), F.col("simhash").cast("long")
    )


def q_ann_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_lsh_topk(emb, queries, dim=dim, k=5, n_planes=6, n_tables=4).select(
        F.col("query_id").cast("long"),
        F.col("vec_id").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )


def q_media_features(spark, sf_dir):
    _tune(spark)
    media = generate_media(spark, n=120, seed=42)
    feats = extract_features(media, dim=16)
    return feats.select(
        F.col("media_id").cast("long"),
        "kind",
        F.col("n_bytes").cast("long"),
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


def q_web_pagerank(spark, sf_dir):
    """End-to-end web pipeline: synthetic pages → Arrow link extraction →
    canonical DiGraph → 20 fixed power iterations (tol=0 so the unrolled
    SQL oracle replays the exact iteration count). The oracle regenerates
    the link table host-side via the pure-Python XXH64 replay
    (functions/xxh64.py) — if extraction or graph canonicalization drops or
    mangles an edge, the ranks diverge and the hash check fails."""
    _tune(spark)
    pages = generate_pages(spark, n_pages=500, links_per_page=8, seed=42)
    g = build_web_graph(pages)
    pr = pagerank(g, max_iterations=20, tol=0)
    return (
        pr.join(g.vertices.select("vid", "url"), "vid")
        .select("url", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), "url")
        .limit(25)
    )


def q_mono_3cycle(spark, sf_dir):
    """Directed 3-cycle monomorphism count on a directed mod graph —
    subgraph_search with a C3 pattern; oracle = 3-way self-join."""
    from arkouda_njit_spark.operators import subgraph_search

    li = _read(spark, sf_dir, "lineitem")
    dg = DiGraph.from_edges(
        spark,
        li.select(
            F.pmod(F.col("l_orderkey"), F.lit(211)).alias("src"),
            F.pmod(F.col("l_partkey") * 7 + F.col("l_suppkey"), F.lit(211)).alias("dst"),
            F.lit(1.0).alias("weight"),
        ).filter(F.col("src") != F.col("dst")),
        num_partitions=_GRAPH_PARTITIONS,
    )
    emb = subgraph_search(dg, [(0, 1), (1, 2), (2, 0)], induced=False)
    return spark.createDataFrame([(emb.count(),)], "n_embeddings long")


def q_gopher_flags(spark, sf_dir):
    """Gopher-style shape/repetition filter flags (public Rae et al. 2021
    rules) per document — the pre-dedup keep/drop gates of the 100 TB text
    pipeline; oracle recomputes every flag in SQL."""
    from arkouda_njit_spark.functions import gopher_quality_flags

    return gopher_quality_flags(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"),
        "flag_word_count", "flag_mean_word", "flag_symbol_ratio",
        "flag_bullet_lines", "flag_alpha_words", "gopher_keep",
    )


def q_host_graph(spark, sf_dir):
    """Host-level webgraph rollup (the Common-Crawl host-webgraph view):
    url→url links aggregated to host→host weights. Oracle replays the
    generator's link draws via the XXH64 port and aggregates in SQL."""
    _tune(spark)
    from arkouda_njit_spark.sources import build_host_graph

    pages = generate_pages(spark, n_pages=500, links_per_page=8, seed=42)
    g = build_host_graph(pages)
    lab = g.vertices.select("vid", F.col("url").alias("host"))
    return (
        g.edges.join(lab.withColumnRenamed("vid", "src").withColumnRenamed("host", "src_host"), "src")
        .join(lab.withColumnRenamed("vid", "dst").withColumnRenamed("host", "dst_host"), "dst")
        .select("src_host", "dst_host", "weight")
    )


def q_bpe_tokens(spark, sf_dir):
    """BPE-ish sub-word piece count (whitespace + punctuation boundaries);
    oracle counts word runs + individual punctuation chars, which is the
    same partition without lookarounds (RE2-safe for DuckDB)."""
    from arkouda_njit_spark.functions import bpe_ish_token_count

    return bpe_ish_token_count(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), F.col("n_bpe_tokens").cast("long")
    )


def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization (sources/pages.py canonicalize_url) over messy
    urls synthesized from lineitem keys — exercises fragment stripping,
    scheme/host lowercasing, and default-port removal; oracle replays the
    same normalization with DuckDB's own RE2 functions."""
    from arkouda_njit_spark.sources import canonicalize_url

    li = _read(spark, sf_dir, "lineitem")
    messy = li.select(
        F.concat(
            F.lit("HTTP://Site"),
            F.pmod("l_partkey", F.lit(50)).cast("string"),
            F.lit(".Example"),
            F.when(F.col("l_orderkey") % 3 == 0, ":80").otherwise(""),
            F.lit("/Path"),
            F.pmod("l_orderkey", F.lit(100)).cast("string"),
            F.when(F.col("l_suppkey") % 2 == 0, "#frag").otherwise(""),
        ).alias("url")
    ).distinct()
    return (
        messy.select("url", canonicalize_url("url").alias("canonical"))
        .orderBy("url")
    )


def q_triad_census(spark, sf_dir):
    """Full 16-class triadic census on the directed mod-211 graph (the
    reference's triads.py workload as ONE closed-form pass instead of 13
    isomorphism searches). Oracle = brute-force enumeration of all C(n,3)
    vertex triples with the public Batagelj–Mrvar tricode table."""
    from arkouda_njit_spark.operators import triadic_census

    li = _read(spark, sf_dir, "lineitem")
    dg = DiGraph.from_edges(
        spark,
        li.select(
            F.pmod(F.col("l_orderkey"), F.lit(211)).alias("src"),
            F.pmod(F.col("l_partkey") * 7 + F.col("l_suppkey"), F.lit(211)).alias("dst"),
            F.lit(1.0).alias("weight"),
        ).filter(F.col("src") != F.col("dst")),
        num_partitions=_GRAPH_PARTITIONS,
    )
    return triadic_census(dg).select("triad_type", F.col("count").cast("long"))


def q_jaccard(spark, sf_dir):
    """Link-prediction family on graph B: for pairs with jaccard >= 0.5,
    the full wedge-weighted score set (common neighbors, Jaccard,
    Adamic-Adar, resource allocation, preferential attachment) from ONE
    wedge pass — operators.linkpred; subsumes the round-1..4 jaccard slot."""
    from arkouda_njit_spark.operators import link_prediction

    g = _graph_b(spark, sf_dir)
    lab = _labels(g)
    lp = link_prediction(g).filter(F.col("jaccard") >= 0.5)
    return (
        lp.join(lab.withColumnRenamed("vid", "u").withColumnRenamed("node", "nu"), "u")
        .join(lab.withColumnRenamed("vid", "v").withColumnRenamed("node", "nv"), "v")
        .select(
            F.col("nu").cast("long").alias("u"),
            F.col("nv").cast("long").alias("v"),
            F.col("common_neighbors").cast("long").alias("cn"),
            F.round("jaccard", 9).alias("jaccard"),
            F.round("adamic_adar", 9).alias("adamic_adar"),
            F.round("resource_allocation", 9).alias("resource_allocation"),
            F.col("preferential_attachment").cast("long").alias("pref_attach"),
        )
    )


def q_clean_corpus(spark, sf_dir):
    """Corpus-cleaning pipeline (quality + language filter + exact dedup
    keep-first); the LSH near-dup stage is exercised by the rows-only
    q_minhash_near_dups entry."""
    from arkouda_njit_spark.functions import clean_corpus

    docs = _docs(spark, sf_dir)
    kept = clean_corpus(
        docs, min_quality=0.5, keep_langs=("en",), with_near_dup=False
    )
    return kept.select(
        F.col("doc_id").cast("long"),
        F.round("quality", 6).alias("quality"),
        F.col("lang_pred"),
    )


def _emb_with_dups(spark, sf_dir):
    """embeddings ∪ a vec_id+100000 shifted copy: the synthetic table has no
    genuinely-near pairs (max pairwise cosine 0.51), so the near-dup queries
    would hash-match trivially on empty results; the duplicated vectors give
    the driver check real rows (every (i, i+100000) pair at cosine 1.0)."""
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    return emb.unionAll(dup)


def q_embedding_near_dups(spark, sf_dir):
    """Both legs of embedding-cosine near-dup in ONE driver row (round-4
    registry consolidation): the exact leg (n_planes=0 => single bucket =
    full pairwise, cosine >= 0.8, vec_id%100000 < 150 subset) unioned with
    the LSH-bucketed scale leg (n_planes=6, cosine >= 0.9, full table),
    tagged by a `method` column. The oracle replays the hyperplane buckets
    as SQL literals (XXH64 port), so the comparison is hash-exact;
    duplicated vectors guarantee real rows on both legs."""
    from arkouda_njit_spark.functions import embedding_near_duplicates

    sub = _emb_with_dups(spark, sf_dir).filter((F.col("vec_id") % 100000) < 150)
    full = _emb_with_dups(spark, sf_dir)
    dim = len(full.select("embedding").first()[0])
    exact = embedding_near_duplicates(sub, dim=dim, threshold=0.8, n_planes=0).select(
        F.lit("exact").alias("method"),
        F.col("a").cast("long"),
        F.col("b").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )
    lsh = embedding_near_duplicates(full, dim=dim, threshold=0.9, n_planes=6).select(
        F.lit("lsh").alias("method"),
        F.col("a").cast("long"),
        F.col("b").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )
    return exact.unionByName(lsh)


def q_edge_support(spark, sf_dir):
    """Per-edge triangle support on graph B — the k-truss peeling kernel's
    inner computation (TrussMsg.chpl support counts)."""
    from arkouda_njit_spark.operators.ktruss import _support
    from arkouda_njit_spark.operators.triangles import _undirected_simple_edges

    g = _graph_b(spark, sf_dir)
    lab = _labels(g)
    sup = _support(
        _undirected_simple_edges(g), n_vertices=g.n_vertices, n_edges=g.n_edges
    )
    return (
        sup.join(lab.withColumnRenamed("vid", "u").withColumnRenamed("node", "nu"), "u")
        .join(lab.withColumnRenamed("vid", "v").withColumnRenamed("node", "nv"), "v")
        .select(
            F.col("nu").cast("long").alias("u"),
            F.col("nv").cast("long").alias("v"),
            F.col("support").cast("long"),
        )
    )


def _graph_c(spark: SparkSession, sf_dir: str) -> Graph:
    """Sparser mod-1201 graph (avg degree ~96 at sf0.01): k-truss peeling
    actually removes edges here, unlike the near-complete graph B."""
    key = ("c", sf_dir)
    if key not in _CACHE:
        li = _read(spark, sf_dir, "lineitem")
        raw = li.select(
            F.pmod(F.col("l_orderkey"), F.lit(1201)).alias("src"),
            F.pmod(F.col("l_partkey") * 7 + F.col("l_suppkey"), F.lit(1201)).alias("dst"),
            F.lit(1.0).alias("weight"),
        ).filter(F.col("src") != F.col("dst"))
        _CACHE[key] = Graph.from_edges(spark, raw, num_partitions=_GRAPH_PARTITIONS)
    return _CACHE[key]


def q_ktruss5(spark, sf_dir):
    """k_truss(graph_c, 5): per-edge -1 (survives) / 4 (peeled) — the
    reference output convention (TrussMsg.chpl:128-617, methods.py:278-318);
    oracle = unrolled support-peel rounds to fixpoint."""
    from arkouda_njit_spark.operators import k_truss

    g = _graph_c(spark, sf_dir)
    lab = _labels(g)
    kt = k_truss(g, 5)
    return (
        kt.join(lab.withColumnRenamed("vid", "u").withColumnRenamed("node", "nu"), "u")
        .join(lab.withColumnRenamed("vid", "v").withColumnRenamed("node", "nv"), "v")
        .select(
            F.col("nu").cast("long").alias("u"),
            F.col("nv").cast("long").alias("v"),
            F.col("value").cast("long"),
        )
    )


def q_diameter_path(spark, sf_dir):
    """diameter() with the reference's true−1 matrix-branch convention
    (Diameter.chpl:195-235) on a data-derived union of path components
    (gaps in the filtered value range split the path)."""
    from arkouda_njit_spark.operators import diameter

    li = _read(spark, sf_dir, "lineitem")
    verts = (
        li.filter(F.col("l_quantity") > 47)
        .select(F.pmod(F.col("l_partkey"), F.lit(701)).alias("v"))
        .distinct()
    )
    has_next = verts.join(verts.select((F.col("v") - 1).alias("v")), "v", "left_semi")
    edges = has_next.select(
        F.col("v").alias("src"), (F.col("v") + 1).alias("dst"), F.lit(1.0).alias("weight")
    )
    g = Graph.from_edges(spark, edges, num_partitions=_GRAPH_PARTITIONS)
    return spark.createDataFrame([(diameter(g),)], "diameter long")


def q_triangle_centrality(spark, sf_dir):
    """Burkhardt triangle centrality on graph B
    (TriangleCentrality.chpl:92-100); oracle = the three-aggregation SQL."""
    from arkouda_njit_spark.operators import triangle_centrality

    g = _graph_b(spark, sf_dir)
    return (
        triangle_centrality(g)
        .join(_labels(g), "vid")
        .select(F.col("node").cast("long"), F.round("centrality", 9).alias("centrality"))
    )


def q_wcc_split(spark, sf_dir):
    """well_connected_components on 10 clusters of two 15-cliques joined by
    one bridge: WCC must split every cluster at the bridge (cut 1 <=
    floor(log10(30))) and emit the 20 cliques (cut 14 > floor(log10(15))).
    Expected output is closed-form: cluster = vertex // 15."""
    _tune(spark)
    from arkouda_njit_spark.operators import well_connected_components

    ids = spark.range(300).select(F.col("id").alias("a"))
    pairs = ids.crossJoin(ids.select(F.col("a").alias("b")))
    cliq = pairs.filter(
        (F.col("a") < F.col("b"))
        & (F.floor(F.col("a") / 15) == F.floor(F.col("b") / 15))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    bridges = spark.range(10).select(
        (F.col("id") * 30).alias("src"), (F.col("id") * 30 + 15).alias("dst")
    )
    clustering = spark.range(300).select(
        F.col("id").alias("node"), F.floor(F.col("id") / 30).cast("long").alias("cluster")
    )
    out = well_connected_components(cliq.unionAll(bridges), clustering)
    return out.select(F.col("vertex").cast("long"), F.col("cluster").cast("long"))


def _propgraph_ls(spark: SparkSession, sf_dir: str):
    """PropGraph over lineitem: edge attr rf = min l_returnflag per
    (part, supplier) pair; node attr grp from part/supplier keys."""
    key = ("pg", sf_dir)
    if key not in _CACHE:
        from arkouda_njit_spark.propgraph import PropGraph

        li = _read(spark, sf_dir, "lineitem")
        edges = li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
            F.col("l_returnflag").alias("rf"),
        )
        pg = PropGraph.from_edge_attributes(edges, "src", "dst", ["rf"])
        part = _read(spark, sf_dir, "part").select(
            F.col("p_partkey").cast("long").alias("nodes"),
            F.pmod(F.col("p_size"), F.lit(4)).cast("long").alias("grp"),
        )
        supp = _read(spark, sf_dir, "supplier").select(
            (F.lit(100000) + F.col("s_suppkey")).cast("long").alias("nodes"),
            F.pmod(F.col("s_nationkey"), F.lit(4)).cast("long").alias("grp"),
        )
        pg.load_node_attributes(part.unionAll(supp), "nodes", ["grp"])
        _CACHE[key] = pg
    return _CACHE[key]


def q_filter_edges(spark, sf_dir):
    """PropGraph.filter_edges (propgraphclass.py:560-597): edges whose
    attribute matches AND both endpoints match the node predicate."""
    _tune(spark)
    pg = _propgraph_ls(spark, sf_dir)
    out = pg.filter_edges({"grp": [0, 1]}, {"rf": ["A", "N"]})
    return out.select(F.col("src").cast("long"), F.col("dst").cast("long"))


def q_subgraph_view(spark, sf_dir):
    """PropGraph.subgraph_view with only a node filter — the reference's
    committed OR-quirk (either endpoint suffices, propgraphclass.py:643-644)."""
    _tune(spark)
    pg = _propgraph_ls(spark, sf_dir)
    sub = pg.subgraph_view(filter_node=F.col("grp") == 2)
    return sub.edge_list().select(
        F.col("src_label").cast("long").alias("u"),
        F.col("dst_label").cast("long").alias("v"),
    )


def _graph_s(spark: SparkSession, sf_dir: str) -> Graph:
    """Small sparse sampled graph (1/40th of lineitem, mod 1201): truss
    decomposition terminates in two k-levels here, so the full
    decomposition loop is oracle-able as unrolled SQL."""
    key = ("s", sf_dir)
    if key not in _CACHE:
        li = _read(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
        raw = li.select(
            F.pmod(F.col("l_orderkey"), F.lit(1201)).alias("src"),
            F.pmod(F.col("l_partkey") * 7 + F.col("l_suppkey"), F.lit(1201)).alias("dst"),
            F.lit(1.0).alias("weight"),
        ).filter(F.col("src") != F.col("dst"))
        _CACHE[key] = Graph.from_edges(spark, raw, num_partitions=_GRAPH_PARTITIONS)
    return _CACHE[key]


def q_truss_decomposition(spark, sf_dir):
    """truss_decomposition: per-edge max k (min 2) — TrussMsg.chpl:1130+,
    methods.py:340-367; oracle = unrolled 3-truss + 4-truss fixpoints.
    Carries max_truss (binary search, TrussMsg.chpl:951-1129) as a constant
    column so both operators share one driver row (round-4 consolidation);
    the crossJoin is with a broadcast 1-row scalar."""
    from arkouda_njit_spark.operators import max_truss, truss_decomposition

    g = _graph_s(spark, sf_dir)
    lab = _labels(g)
    td = truss_decomposition(g)
    mt = spark.createDataFrame([(max_truss(g),)], "max_truss long")
    return (
        td.join(lab.withColumnRenamed("vid", "u").withColumnRenamed("node", "nu"), "u")
        .join(lab.withColumnRenamed("vid", "v").withColumnRenamed("node", "nv"), "v")
        .crossJoin(F.broadcast(mt))
        .select(
            F.col("nu").cast("long").alias("u"),
            F.col("nv").cast("long").alias("v"),
            F.col("truss").cast("long"),
            F.col("max_truss").cast("long"),
        )
    )


def q_triangles_subset(spark, sf_dir):
    """triangles_per_vertex AND ar.triangles(graph, vertices) in one row
    per node (round-5 registry consolidation): every vertex's triangle
    count, plus the subset query's INPUT-order position for the requested
    labels (unknown labels dropped, methods.py:174-222; pos = -1 for
    unrequested nodes)."""
    from arkouda_njit_spark.operators import triangles

    g = _graph_b(spark, sf_dir)
    sub = triangles(g, [7, 3, 150, 42, 99999]).select(
        F.col("node").cast("long"), F.col("pos").cast("long")
    )
    full = (
        triangles_per_vertex(g)
        .join(_labels(g), "vid")
        .select(F.col("node").cast("long"), F.col("triangles").cast("long"))
    )
    return full.join(sub, "node", "left").select(
        "node", "triangles", F.coalesce("pos", F.lit(-1)).cast("long").alias("pos")
    )


# ---------------------------------------------------------------------------
# round-5 additions: the round-4 kernels under the driver oracle
# ---------------------------------------------------------------------------


def _digraph_w(spark: SparkSession, sf_dir: str) -> DiGraph:
    """Directed 'web-shaped' graph for SCC/bow-tie: mostly-forward edges
    over 200 vertices with long-range back edges on every 7th draw, which
    yields a real, SHALLOW Broder structure at sf0.01 — a giant SCC of
    171, a second SCC of 2, 27 singletons, IN=14 / OUT=14 fringes — and
    trims to its cyclic core in 3 degree-peel rounds (deep-chain inputs
    make the label-exchange SCC loop latency-bound, which is a kernel
    property the RMAT scaling study covers, not something to pay in the
    50-query correctness window)."""
    key = ("w", sf_dir)
    if key not in _CACHE:
        li = _read(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 80 == 0)
        s = F.pmod(F.col("l_partkey") * 3 + F.col("l_suppkey"), F.lit(200))
        d = F.when(
            F.col("l_orderkey") % 7 == 0,
            F.greatest(F.lit(0), s - F.pmod(F.col("l_orderkey"), F.lit(60))),
        ).otherwise(F.least(F.lit(199), s + 1 + F.pmod(F.col("l_orderkey"), F.lit(25))))
        raw = (
            li.select(s.alias("src"), d.alias("dst"), F.lit(1.0).alias("weight"))
            .filter(F.col("src") != F.col("dst"))
        )
        _CACHE[key] = DiGraph.from_edges(spark, raw, num_partitions=_GRAPH_PARTITIONS)
    return _CACHE[key]


def q_scc_bowtie(spark, sf_dir):
    """Strongly connected components (min-label canonical ids), component
    sizes AND the Broder bow-tie region per vertex, in one driver row
    (operators/scc.py — beyond-reference; the reference ships only
    undirected CC). Oracle = recursive-CTE transitive closure: mutual
    reachability for the SCC labels, closure-from/to the giant SCC for
    the regions."""
    from arkouda_njit_spark.operators import bowtie_decomposition
    from arkouda_njit_spark.operators import strongly_connected_components

    dg = _digraph_w(spark, sf_dir)
    lab = dg.vertices.select("vid", F.col("label").alias("node"))
    scc = strongly_connected_components(dg).localCheckpoint(eager=True)
    region = bowtie_decomposition(dg, scc=scc)
    scc_lab = lab.select(F.col("vid").alias("scc"), F.col("node").alias("scc_label"))
    out = (
        scc.join(lab, "vid")
        .join(scc_lab, "scc")
        .select("vid", "node", F.col("scc_label").alias("scc"))
    )
    sizes = out.groupBy("scc").agg(F.count("*").cast("long").alias("scc_size"))
    return (
        out.join(sizes, "scc")
        .join(region, "vid")
        .select(
            F.col("node").cast("long"),
            F.col("scc").cast("long"),
            "scc_size",
            "region",
        )
    )


def q_kcore(spark, sf_dir):
    """Per-vertex core number via monotone level peeling (operators/
    kcore.py — the reference's truss pre-stage promoted to a public
    operator, TrussMsg.chpl:222-247). Oracle = unrolled degree-peel
    fixpoints per level (same family as the k-truss oracle)."""
    from arkouda_njit_spark.operators import core_decomposition

    g = _graph_s(spark, sf_dir)
    return (
        core_decomposition(g)
        .join(_labels(g), "vid")
        .select(F.col("node").cast("long"), F.col("core").cast("long"))
    )


def q_hits5(spark, sf_dir):
    """HITS hubs/authorities (5 fixed alternating sum-normalized
    iterations, operators/hits.py) PLUS eigenvector centrality (5 power
    iterations on A^T + I, operators/eigenvector.py) PLUS SALSA (5
    degree-normalized alternating iterations, operators/salsa.py) on the
    PLUS Katz centrality (5 fixed attenuated iterations + one final L2
    normalize, operators/katz.py) on the same directed graph A — merged
    into one slot (round-5 registry consolidation; all four are spectral
    per-vertex scores of the same digraph). Oracle = unrolled iterations
    like the PageRank oracle."""
    from arkouda_njit_spark.operators import (
        eigenvector_centrality,
        hits,
        katz_centrality,
        salsa,
    )

    li = _read(spark, sf_dir, "lineitem")
    dg = DiGraph.from_edges(
        spark,
        li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
        num_partitions=_GRAPH_PARTITIONS,
    )
    out = hits(dg, max_iterations=5, tol=0.0)
    eig = eigenvector_centrality(dg, max_iterations=5, tol=0.0)
    sal = salsa(dg, max_iterations=5, tol=0.0).select(
        "vid",
        F.col("hub").alias("salsa_hub"),
        F.col("auth").alias("salsa_auth"),
    )
    kz = katz_centrality(dg, alpha=0.1, beta=1.0, tol=0.0, max_iterations=5)
    return (
        out.join(eig, "vid")
        .join(sal, "vid")
        .join(kz, "vid")
        .join(dg.vertices.select("vid", F.col("label").alias("node")), "vid")
        .select(
            F.col("node").cast("long"),
            F.round("hub", 9).alias("hub"),
            F.round("auth", 9).alias("auth"),
            F.round("eigenvector", 9).alias("eig"),
            F.round("salsa_hub", 9).alias("salsa_hub"),
            F.round("salsa_auth", 9).alias("salsa_auth"),
            F.round("katz", 9).alias("katz"),
        )
    )


#: closed-form deterministic digraph for the walk-replay oracle: labels
#: 0..59, three out-edges per vertex (dedup'd, self-loops dropped) — the
#: SAME formula is replayed host-side through the XXH64 port to compute
#: the expected walks as SQL literals.
_WALK_N = 60


def _walk_edge_pairs() -> list[tuple[int, int]]:
    pairs = set()
    for i in range(_WALK_N):
        for d in ((i * 7 + 3) % _WALK_N, (i * 13 + 5) % _WALK_N, (i + 1) % _WALK_N):
            if d != i:
                pairs.add((i, d))
    return sorted(pairs)


def q_random_walks(spark, sf_dir):
    """Deterministic uniform random walks (operators/walks.py — the
    DeepWalk corpus generator): length-8 walks from every vertex of the
    closed-form 60-vertex digraph, returned as walk_corpus sentences
    (space-joined labels). The neighbor draw is argmin
    xxhash64(walk_id, step, dst, seed) — a pure function of the tuple —
    so the oracle replays every step host-side through the XXH64 port
    (functions/xxh64.py) and inlines the expected sentences as literals;
    any divergence in the join/min_by/path-reassembly pipeline changes a
    sentence and fails the hash check."""
    _tune(spark)
    from arkouda_njit_spark.operators import walk_corpus

    edges = spark.createDataFrame(
        _walk_edge_pairs(), "src long, dst long"
    ).withColumn("weight", F.lit(1.0))
    dg = DiGraph.from_edges(spark, edges, num_partitions=_GRAPH_PARTITIONS)
    return walk_corpus(dg, walk_length=8, walks_per_vertex=1, seed=42).select(
        F.col("walk_id").cast("long"), "sentence"
    )


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-wide paragraph-level exact dedup (functions/dedup.py
    paragraph_dedup — the C4-style boilerplate filter): documents are
    given three paragraphs (their text, a shared boilerplate line, their
    40-char prefix) over the dup-augmented corpus, so the boilerplate
    repeats ~550x (kept once, at the smallest (doc_id, pos)) and each
    +1000000 copy's paragraphs repeat twice. Oracle recomputes the whole
    explode → digest-count → keep-first → reassemble pipeline in SQL."""
    from arkouda_njit_spark.functions import paragraph_dedup

    docs = _docs_with_dups(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.col("text"),
            F.lit("Subscribe to our newsletter today"),
            F.substring(F.col("text"), 1, 40),
        ).alias("text"),
    )
    out = paragraph_dedup(docs, min_repeats=2, keep="first")
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("text_dedup"),
        F.col("n_paras_removed").cast("long"),
    )


def q_clustering(spark, sf_dir):
    """Per-vertex clustering coefficient (triangles / C(deg,2)) on graph B
    (operators/clustering.py — beyond-reference structural analytics over
    the degree-oriented triangle kernel)."""
    from arkouda_njit_spark.operators import clustering_coefficients

    g = _graph_b(spark, sf_dir)
    return (
        clustering_coefficients(g)
        .join(_labels(g), "vid")
        .select(
            F.col("node").cast("long"),
            F.col("triangles").cast("long"),
            F.col("deg").cast("long"),
            F.round("clustering", 9).alias("clustering"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "build_edges": q_build_edges,
        "degree": q_degree,
        "density": q_density,
        "triangle_count": q_triangle_count,
        "squares": q_squares,
        "pagerank5": q_pagerank5,
        "pagerank3_weighted": q_pagerank3_weighted,
        "connected_components": q_connected_components,
        "lpa4": q_lpa4,
        "bfs": q_bfs,
        "complete_graph": q_complete_graph,
        "text_stats": q_text_stats,
        "exact_dups": q_exact_dups,
        "louvain": q_louvain,
        "strings": q_strings,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_topk": q_embedding_topk,
        "ann_ivf_exhaustive": q_ann_ivf_exhaustive,
        "events_rollup": q_events_rollup,
        "sessionize": q_sessionize,
        "mono_3cycle": q_mono_3cycle,
        "gopher_flags": q_gopher_flags,
        "host_graph": q_host_graph,
        "bpe_tokens": q_bpe_tokens,
        "url_canonicalize": q_url_canonicalize,
        "triad_census": q_triad_census,
        "jaccard": q_jaccard,
        "clean_corpus": q_clean_corpus,
        "embedding_near_dups": q_embedding_near_dups,
        "edge_support": q_edge_support,
        "ktruss5": q_ktruss5,
        "diameter_path": q_diameter_path,
        "triangle_centrality": q_triangle_centrality,
        "truss_decomposition": q_truss_decomposition,
        "wcc_split": q_wcc_split,
        "filter_edges": q_filter_edges,
        "subgraph_view": q_subgraph_view,
        "relabel": q_relabel,
        "triangles_subset": q_triangles_subset,
        # round-5 additions: the round-4 kernels under the driver oracle
        "scc_bowtie": q_scc_bowtie,
        "kcore": q_kcore,
        "hits5": q_hits5,
        "random_walks": q_random_walks,
        "paragraph_dedup": q_paragraph_dedup,
        "clustering": q_clustering,
        # rows-only in round 1, oracled since round 2:
        "minhash_near_dups": q_minhash_near_dups,
        "simhash": q_simhash,
        "ann_topk": q_ann_topk,
        "media_features": q_media_features,
        "web_pagerank": q_web_pagerank,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; tables pre-registered as views)
# ---------------------------------------------------------------------------

_A_EDGES = """
edges AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS u, 100000 + l_suppkey AS v FROM lineitem
),
sym AS MATERIALIZED (
  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
),
verts AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u)
"""

_B_EDGES = """
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % 301, l_partkey % 301) AS u,
                  GREATEST(l_orderkey % 301, l_partkey % 301) AS v
  FROM lineitem
  WHERE l_orderkey % 301 <> l_partkey % 301
),
bsym AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
bverts AS MATERIALIZED (SELECT DISTINCT u AS node FROM bsym)
"""

_DOCS = "docs AS (SELECT * FROM documents WHERE length(trim(text)) > 0)"

# replay of _docs_with_dups: deterministic duplicate slices so the dedup
# queries produce real (non-vacuous) rows — see _docs_with_dups docstring
_DOCS_DUP = (
    _DOCS
    + """,
docsdup AS (
  SELECT doc_id, text FROM docs
  UNION ALL SELECT doc_id + 1000000, text FROM docs WHERE doc_id % 20 = 0
  UNION ALL SELECT doc_id + 2000000, text || ' neardup tail' FROM docs
  WHERE doc_id % 20 = 5
)"""
)

_TOKS = (
    _DOCS
    + """,
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM docs
)"""
)

# 3-gram word shingles (fallback to whole trimmed text for short docs)
_SHINGLES = (
    _DOCS
    + """,
tk AS (SELECT doc_id, trim(text) AS txt,
              regexp_split_to_array(trim(text), '\\s+') AS t FROM docs),
sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 3
                THEN [array_to_string(t[i+1:i+3], ' ') for i in range(len(t)-2)]
                ELSE [txt] END) AS s
  FROM tk
)"""
)


def _minhash_near_dup_sql(num_hashes: int, bands: int, threshold: float) -> str:
    """Full MinHash-LSH pipeline replayed in ANSI SQL: shingle → K string-min
    md5 signatures → banded md5 bucket keys → bucket self-join candidates →
    exact Jaccard verify over the candidate pairs (functions/dedup.py
    semantics, engine-independent because the hash family is md5)."""
    rpb = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(md5('{i}:' || s)) AS mh{i}" for i in range(num_hashes)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bh FROM sigs".format(
            b=b,
            expr=" || '|' || ".join(f"mh{b * rpb + r}" for r in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLES},
shd AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM sh),
sigs AS MATERIALIZED (
  SELECT doc_id,
         {mins}
  FROM shd GROUP BY doc_id
),
bands AS MATERIALIZED (
  {band_selects}
),
cand AS MATERIALIZED (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
),
sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS common
  FROM cand c
  JOIN shd la ON la.doc_id = c.a
  JOIN shd lb ON lb.doc_id = c.b AND lb.s = la.s
  GROUP BY c.a, c.b
)
SELECT a, b, ROUND(common * 1.0 / (sa.sz + sb.sz - common), 9) AS jaccard
FROM inter JOIN sz sa ON inter.a = sa.doc_id
           JOIN sz sb ON inter.b = sb.doc_id
WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {threshold}
"""


def _plane_literals(dim: int, n_planes: int, seed: int) -> list[str]:
    """LSH hyperplane components as SQL DOUBLE[] literals, replayed through
    the pure-Python XXH64 port (functions/xxh64.py — bit-exact vs Spark,
    see test_xxh64_matches_spark). The planes are data-independent
    parameters of the operator, so inlining them keeps the oracle an
    independent recomputation of everything data-dependent."""
    from arkouda_njit_spark.functions.xxh64 import TWO63, spark_xxhash64

    out = []
    for i in range(n_planes):
        comps = [
            spark_xxhash64(("int", j), ("int", i), ("int", seed)) / TWO63
            for j in range(dim)
        ]
        out.append("[" + ", ".join(repr(c) for c in comps) + "]")
    return out


def _bucket_expr(planes: list[str]) -> str:
    """SQL for the hyperplane bucket id: sign bits of dot(vec, plane_i).
    Computed on the raw vector — sign-equivalent to Spark's normalized dot
    (positive norm never flips a sign)."""
    return "\n       + ".join(
        f"(CASE WHEN list_dot_product(v, {p}) > 0 THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def _ann_lsh_sql(dim: int, k: int, n_planes: int, n_tables: int, seed: int = 42) -> str:
    """ann_lsh_topk replay: per-table bucket ids from inlined plane
    literals, candidate = corpus row sharing the query's bucket in ANY
    table, exact cosine rerank."""
    table_selects = "\n  UNION ALL ".join(
        "SELECT vec_id, {t} AS tbl,\n       {expr} AS bucket\n  FROM e".format(
            t=t, expr=_bucket_expr(_plane_literals(dim, n_planes, seed + 1000 * t))
        )
        for t in range(n_tables)
    )
    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS MATERIALIZED (
  {table_selects}
),
cand AS MATERIALIZED (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
  FROM b qb JOIN b cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
  WHERE qb.vec_id < 5
),
scored AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(eq.v, ec.v) AS cos
  FROM cand c JOIN e eq ON eq.vec_id = c.query_id
              JOIN e ec ON ec.vec_id = c.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, ROUND(CAST(cos AS DOUBLE), 6) AS cosine
FROM ranked WHERE rn <= {k}
"""


def _embedding_near_dup_sql(
    dim: int,
    exact_threshold: float,
    exact_subset: int,
    lsh_threshold: float,
    n_planes: int,
    seed: int = 42,
) -> str:
    """q_embedding_near_dups replay — BOTH legs in one result set: the
    exact full-pairwise leg over the vec_id%100000 < exact_subset slice,
    UNION ALL the LSH bucket self-join leg over the whole table, each
    tagged with a ``method`` literal."""
    expr = _bucket_expr(_plane_literals(dim, n_planes, seed))
    return f"""
WITH aug AS (SELECT vec_id, embedding FROM embeddings
             UNION ALL
             SELECT vec_id + 100000, embedding FROM embeddings),
e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM aug),
sub AS MATERIALIZED (SELECT vec_id, v FROM e WHERE vec_id % 100000 < {exact_subset}),
b AS MATERIALIZED (
  SELECT vec_id, v,
       {expr} AS bucket
  FROM e
)
SELECT 'exact' AS method, l.vec_id AS a, r.vec_id AS b,
       ROUND(CAST(list_cosine_similarity(l.v, r.v) AS DOUBLE), 6) AS cosine
FROM sub l JOIN sub r ON l.vec_id < r.vec_id
WHERE list_cosine_similarity(l.v, r.v) >= {exact_threshold}
UNION ALL
SELECT 'lsh' AS method, l.vec_id AS a, r.vec_id AS b,
       ROUND(CAST(list_cosine_similarity(l.v, r.v) AS DOUBLE), 6) AS cosine
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE list_cosine_similarity(l.v, r.v) >= {lsh_threshold}
"""


def _page_link_values(n_pages: int, links_per_page: int, seed: int) -> str:
    """The synthetic generator's (src_pid, dst_pid) link draws as a SQL
    VALUES body, replayed host-side through the XXH64 port."""
    from arkouda_njit_spark.functions.xxh64 import u01

    draws = []
    for link_id in range(n_pages * links_per_page):
        pid = link_id // links_per_page
        u = u01(("long", link_id), ("int", seed))
        dst = int(u * u * n_pages)  # floor: u*u*n_pages < n_pages
        draws.append(f"({pid},{dst})")
    return ",".join(draws)


def _host_graph_sql(n_pages: int, links_per_page: int, seed: int) -> str:
    """build_host_graph replay: same replayed link draws, pids mapped to
    their generator hosts (site<pid%97>.example), aggregated to host→host
    weights with self-host links dropped."""
    values = _page_link_values(n_pages, links_per_page, seed)
    return f"""
WITH links(src, dst) AS (VALUES {values}),
hl AS (
  SELECT 'site' || CAST(src % 97 AS VARCHAR) || '.example' AS src_host,
         'site' || CAST(dst % 97 AS VARCHAR) || '.example' AS dst_host
  FROM links
)
SELECT src_host, dst_host, CAST(COUNT(*) AS DOUBLE) AS weight
FROM hl WHERE src_host <> dst_host
GROUP BY 1, 2
"""


def _web_pagerank_sql(n_pages: int, links_per_page: int, seed: int, iters: int, topk: int) -> str:
    """q_web_pagerank replay: regenerate the link draws host-side via the
    XXH64 port (sources/pages.py's quadratic-skew formula), then replay
    canonicalization (self-link drop, dedup) and ``iters`` unrolled
    weighted-uniform power iterations with dangling-mass redistribution.
    The html-extraction leg is covered because any extraction divergence
    changes the Spark-side edge set and therefore every rank."""
    values = _page_link_values(n_pages, links_per_page, seed)
    base = repr((1.0 - 0.85))  # Spark computes (1-alpha) in doubles
    parts = [
        f"""
WITH links(src, dst) AS (VALUES {values}),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM links WHERE src <> dst),
verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
dang AS MATERIALIZED (
  SELECT v FROM verts WHERE v NOT IN (SELECT src FROM e)
),
pr0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nn) AS rank FROM verts)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
c{i} AS MATERIALIZED (
  SELECT e.dst AS v, SUM((1.0 / d.d) * p.rank) AS c
  FROM e JOIN pr{i-1} p ON e.src = p.v JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
dm{i} AS (SELECT COALESCE(SUM(p.rank), 0.0) AS dm
          FROM pr{i-1} p JOIN dang ON p.v = dang.v),
pr{i} AS MATERIALIZED (
  SELECT v.v,
         {base}/(SELECT n FROM nn)
         + 0.85 * (SELECT dm FROM dm{i}) / (SELECT n FROM nn)
         + 0.85 * COALESCE(c.c, 0.0) AS rank
  FROM verts v LEFT JOIN c{i} c ON v.v = c.v
)"""
        )
    parts.append(
        f"""
SELECT 'https://site' || CAST(v % 97 AS VARCHAR) || '.example/p' || CAST(v AS VARCHAR) AS url,
       ROUND(rank, 9) AS rank
FROM pr{iters} ORDER BY ROUND(rank, 9) DESC, url LIMIT {topk}"""
    )
    return "".join(parts)


def _triad_census_sql() -> str:
    """Brute-force triadic census for the mod-211 digraph: enumerate every
    sorted vertex triple, look up the 6 possible edges, map the 6-bit code
    through the published Batagelj–Mrvar tricode table. Completely
    independent of the engine's closed-form (combinatorial) evaluation."""
    from arkouda_njit_spark.operators.triads import TRIAD_NAMES, _TRICODES

    names = "[" + ", ".join(f"'{t}'" for t in TRIAD_NAMES) + "]"
    tricodes = "[" + ", ".join(str(t) for t in _TRICODES) + "]"
    name_rows = ", ".join(f"('{t}')" for t in TRIAD_NAMES)
    return f"""
WITH de AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % 211 AS s, (l_partkey * 7 + l_suppkey) % 211 AS d
  FROM lineitem WHERE l_orderkey % 211 <> (l_partkey * 7 + l_suppkey) % 211
),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT s AS v FROM de UNION ALL SELECT d FROM de)
),
tr AS (
  SELECT a.v AS x1, b.v AS x2, c.v AS x3
  FROM verts a JOIN verts b ON a.v < b.v JOIN verts c ON b.v < c.v
),
coded AS (
  SELECT (CASE WHEN e1.s IS NOT NULL THEN 1 ELSE 0 END)
       + (CASE WHEN e2.s IS NOT NULL THEN 2 ELSE 0 END)
       + (CASE WHEN e3.s IS NOT NULL THEN 4 ELSE 0 END)
       + (CASE WHEN e4.s IS NOT NULL THEN 8 ELSE 0 END)
       + (CASE WHEN e5.s IS NOT NULL THEN 16 ELSE 0 END)
       + (CASE WHEN e6.s IS NOT NULL THEN 32 ELSE 0 END) AS code
  FROM tr
  LEFT JOIN de e1 ON e1.s = tr.x1 AND e1.d = tr.x2
  LEFT JOIN de e2 ON e2.s = tr.x2 AND e2.d = tr.x1
  LEFT JOIN de e3 ON e3.s = tr.x1 AND e3.d = tr.x3
  LEFT JOIN de e4 ON e4.s = tr.x3 AND e4.d = tr.x1
  LEFT JOIN de e5 ON e5.s = tr.x2 AND e5.d = tr.x3
  LEFT JOIN de e6 ON e6.s = tr.x3 AND e6.d = tr.x2
),
counted AS (
  SELECT {names}[{tricodes}[code + 1]] AS triad_type, COUNT(*) AS cnt
  FROM coded GROUP BY 1
),
allnames(triad_type) AS (VALUES {name_rows})
SELECT a.triad_type, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS count
FROM allnames a LEFT JOIN counted c ON a.triad_type = c.triad_type
"""


def _media_features_sql(n: int, seed: int, dim: int) -> str:
    """q_media_features replay: regenerate the synthetic media payload
    bytes host-side (functions/multimodal.py generate_media — printable
    ASCII from xxhash64 draws, replayed through the XXH64 port), inline
    them as VALUES, and recompute the fake feature (byte histogram folded
    modulo ``dim``, L2-normalized in float32) in SQL. Verifies the
    mapInPandas Arrow plumbing end-to-end: wrong batch shapes, dropped
    rows, or mangled bytes all change f0."""
    from arkouda_njit_spark.functions.xxh64 import spark_xxhash64

    kinds = ["image", "audio", "video"]
    rows = []
    for mid in range(n):
        byts = [
            spark_xxhash64(("long", mid), ("int", i), ("int", seed)) % 94 + 33
            for i in range(64)
        ]
        rows.append(f"({mid},'{kinds[mid % 3]}',{byts!r})".replace(" ", ""))
    values = ",".join(rows)
    return f"""
WITH media(media_id, kind, bytes) AS (VALUES {values}),
ex AS (SELECT media_id, unnest(bytes) % {dim} AS r FROM media),
cnt AS (SELECT media_id, r, CAST(COUNT(*) AS DOUBLE) AS c FROM ex GROUP BY 1, 2),
agg AS (
  SELECT media_id, SUM(c * c) AS ss,
         COALESCE(SUM(c) FILTER (r = 0), 0) AS f0n
  FROM cnt GROUP BY media_id
)
SELECT m.media_id, m.kind, len(m.bytes) AS n_bytes,
       ROUND(CAST(CAST(CAST(a.f0n AS REAL) / CAST(sqrt(a.ss) AS REAL) AS REAL)
                  AS DOUBLE), 6) AS f0
FROM media m JOIN agg a ON m.media_id = a.media_id
"""


def _unrolled_pagerank_weighted(iters: int) -> str:
    """Weighted power iterations: transition probability w/out_weight_total,
    weights = duplicate-row multiplicities (graph A build semantics)."""
    parts = ["""WITH we AS MATERIALIZED (
  SELECT l_partkey AS u, 100000 + l_suppkey AS v, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem GROUP BY 1, 2
),
wsym AS MATERIALIZED (SELECT u, v, w FROM we UNION ALL SELECT v AS u, u AS v, w FROM we),
verts AS MATERIALIZED (SELECT DISTINCT u AS node FROM wsym),
nn AS (SELECT COUNT(*) AS n FROM verts),
outw AS MATERIALIZED (SELECT u, SUM(w) AS ow FROM wsym GROUP BY u),
pr0 AS MATERIALIZED (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM verts)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
c{i} AS MATERIALIZED (
  SELECT s.v AS node, SUM((s.w / o.ow) * p.rank) AS c
  FROM wsym s JOIN pr{i-1} p ON s.u = p.node JOIN outw o ON s.u = o.u
  GROUP BY s.v
),
pr{i} AS MATERIALIZED (
  SELECT v.node,
         0.15/(SELECT n FROM nn) + 0.85 * COALESCE(c.c, 0) AS rank
  FROM verts v LEFT JOIN c{i} c ON v.node = c.node
)""")
    parts.append(f"\nSELECT node, ROUND(rank, 9) AS rank FROM pr{iters}")
    return "".join(parts)


def _unrolled_pagerank(iters: int) -> str:
    parts = [f"WITH {_A_EDGES}, pr0 AS MATERIALIZED (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM verts)"]
    for i in range(1, iters + 1):
        parts.append(
            f""",
c{i} AS MATERIALIZED (
  SELECT s.v AS node, SUM(p.rank / d.deg) AS c
  FROM sym s JOIN pr{i-1} p ON s.u = p.node JOIN deg d ON s.u = d.node
  GROUP BY s.v
),
pr{i} AS MATERIALIZED (
  SELECT v.node,
         0.15/(SELECT n FROM nn) + 0.85 * COALESCE(c.c, 0) AS rank
  FROM verts v LEFT JOIN c{i} c ON v.node = c.node
)"""
        )
    parts.append(
        f"\nSELECT node, ROUND(rank, 9) AS rank FROM pr{iters}"
    )
    return "".join(parts)


def _unrolled_cc(rounds: int) -> str:
    parts = [f"WITH {_A_EDGES}, cc0 AS MATERIALIZED (SELECT node, node AS comp FROM verts)"]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
m{i} AS MATERIALIZED (
  SELECT s.v AS node, MIN(p.comp) AS mc
  FROM sym s JOIN cc{i-1} p ON s.u = p.node GROUP BY s.v
),
cc{i} AS MATERIALIZED (
  SELECT p.node, LEAST(p.comp, COALESCE(m.mc, p.comp)) AS comp
  FROM cc{i-1} p LEFT JOIN m{i} m ON p.node = m.node
)"""
        )
    parts.append(f"\nSELECT node, comp AS component FROM cc{rounds}")
    return "".join(parts)


def _unrolled_lpa(rounds: int) -> str:
    parts = [f"WITH {_A_EDGES}, lp0 AS MATERIALIZED (SELECT node, node AS label FROM verts)"]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
f{i} AS MATERIALIZED (
  SELECT s.v AS node, p.label, COUNT(*) AS cnt
  FROM sym s JOIN lp{i-1} p ON s.u = p.node GROUP BY s.v, p.label
),
b{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
    FROM f{i}
  ) WHERE rn = 1
),
lp{i} AS MATERIALIZED (
  SELECT p.node, COALESCE(b.label, p.label) AS label
  FROM lp{i-1} p LEFT JOIN b{i} b ON p.node = b.node
)"""
        )
    parts.append(f"\nSELECT node, label FROM lp{rounds}")
    return "".join(parts)


def _unrolled_ktruss(k: int, rounds: int) -> str:
    """Unrolled support-peel rounds (TrussMsg.chpl semantics): per round,
    per-edge support = common-neighbor count over the CURRENT edge set;
    edges below k-2 are peeled. ``rounds`` must cover the fixpoint (4 at
    sf0.01 for k=5; extra rounds are idempotent)."""
    thr = k - 2
    parts = [
        """WITH e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % 1201, (l_partkey*7+l_suppkey) % 1201) AS u,
                  GREATEST(l_orderkey % 1201, (l_partkey*7+l_suppkey) % 1201) AS v
  FROM lineitem WHERE l_orderkey % 1201 <> (l_partkey*7+l_suppkey) % 1201
)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
sym{r} AS MATERIALIZED (SELECT u, v FROM e{r} UNION ALL SELECT v AS u, u AS v FROM e{r}),
sup{r} AS MATERIALIZED (
  SELECT e.u, e.v, COUNT(*) AS c
  FROM e{r} e JOIN sym{r} a ON a.u = e.u JOIN sym{r} b ON b.u = e.v AND b.v = a.v
  GROUP BY e.u, e.v
),
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e JOIN sup{r} s ON e.u = s.u AND e.v = s.v
  WHERE s.c >= {thr}
)"""
        )
    parts.append(
        f"""
SELECT e0.u, e0.v,
       CAST(CASE WHEN k.u IS NOT NULL THEN -1 ELSE {k - 1} END AS BIGINT) AS value
FROM e0 LEFT JOIN e{rounds} k ON e0.u = k.u AND e0.v = k.v"""
    )
    return "".join(parts)


def _peel_rounds(prefix: str, src_cte: str, k: int, rounds: int) -> str:
    """SQL fragment: ``rounds`` support-peel rounds at threshold k-2 over
    ``src_cte`` (u,v); final surviving set is ``{prefix}{rounds}``."""
    thr = k - 2
    parts = [f",\n{prefix}0 AS MATERIALIZED (SELECT u, v FROM {src_cte})"]
    for r in range(rounds):
        parts.append(
            f""",
{prefix}sym{r} AS MATERIALIZED (
  SELECT u, v FROM {prefix}{r} UNION ALL SELECT v AS u, u AS v FROM {prefix}{r}
),
{prefix}sup{r} AS MATERIALIZED (
  SELECT e.u, e.v, COUNT(*) AS c
  FROM {prefix}{r} e JOIN {prefix}sym{r} a ON a.u = e.u
                     JOIN {prefix}sym{r} b ON b.u = e.v AND b.v = a.v
  GROUP BY e.u, e.v
),
{prefix}{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prefix}{r} e
  JOIN {prefix}sup{r} s ON e.u = s.u AND e.v = s.v
  WHERE s.c >= {thr}
)"""
        )
    return "".join(parts)


# truss decomposition oracle over the small sampled graph: per-edge truss =
# 4 if in the 4-truss fixpoint, 3 if in the 3-truss fixpoint, else 2
# (empirically max_truss = 3 at sf0.01; the 4-level guards the claim)
_TRUSS_DECOMP_SQL = (
    """WITH se AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % 1201, (l_partkey*7+l_suppkey) % 1201) AS u,
                  GREATEST(l_orderkey % 1201, (l_partkey*7+l_suppkey) % 1201) AS v
  FROM lineitem
  WHERE l_orderkey % 40 = 0
    AND l_orderkey % 1201 <> (l_partkey*7+l_suppkey) % 1201
)"""
    + _peel_rounds("t3_", "se", 3, 4)
    + _peel_rounds("t4_", "t3_4", 4, 3)
    + """
SELECT se.u, se.v,
       CAST(CASE WHEN f4.u IS NOT NULL THEN 4
                 WHEN f3.u IS NOT NULL THEN 3
                 ELSE 2 END AS BIGINT) AS truss
FROM se LEFT JOIN t3_4 f3 ON se.u = f3.u AND se.v = f3.v
        LEFT JOIN t4_3 f4 ON se.u = f4.u AND se.v = f4.v"""
)

_B_TRI = """
tri AS MATERIALIZED (
  SELECT ab.u AS a, ab.v AS b, ac.v AS c
  FROM und ab JOIN und ac ON ab.u = ac.u AND ab.v < ac.v
              JOIN und bc ON bc.u = ab.v AND bc.v = ac.v
),
cnt AS MATERIALIZED (
  SELECT x AS node, COUNT(*) AS t FROM (
    SELECT a AS x FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) GROUP BY x
)"""

_PG_ATTRS = """
ea AS MATERIALIZED (
  SELECT l_partkey AS src, 100000 + l_suppkey AS dst, MIN(l_returnflag) AS rf
  FROM lineitem GROUP BY 1, 2
),
na AS MATERIALIZED (
  SELECT CAST(p_partkey AS BIGINT) AS nodes, CAST(p_size % 4 AS BIGINT) AS grp FROM part
  UNION ALL
  SELECT CAST(100000 + s_suppkey AS BIGINT), CAST(s_nationkey % 4 AS BIGINT) FROM supplier
)"""


_RCM_SQL = """
WITH base(u, v) AS (
  SELECT i, i + 1 FROM generate_series(0, 11) t(i)
  UNION ALL
  SELECT i, i + 50 FROM generate_series(0, 11) t(i) WHERE i % 2 = 0
  UNION ALL
  SELECT * FROM (VALUES (100, 101), (101, 102), (102, 100))
),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v FROM base WHERE u <> v
),
sym AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
verts AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u),
start AS MATERIALIZED (SELECT node FROM deg ORDER BY deg, node LIMIT 1),
d0 AS MATERIALIZED (
  SELECT v.node,
         CASE WHEN v.node = (SELECT node FROM start) THEN 0
              ELSE 1000000 END AS dist
  FROM verts v
),
d1 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d0 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d0 p ON p.node = v.node
),
d2 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d1 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d1 p ON p.node = v.node
),
d3 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d2 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d2 p ON p.node = v.node
),
d4 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d3 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d3 p ON p.node = v.node
),
d5 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d4 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d4 p ON p.node = v.node
),
d6 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d5 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d5 p ON p.node = v.node
),
d7 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d6 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d6 p ON p.node = v.node
),
d8 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d7 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d7 p ON p.node = v.node
),
d9 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d8 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d8 p ON p.node = v.node
),
d10 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d9 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d9 p ON p.node = v.node
),
d11 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d10 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d10 p ON p.node = v.node
),
d12 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d11 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d11 p ON p.node = v.node
),
d13 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d12 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d12 p ON p.node = v.node
),
d14 AS MATERIALIZED (
  SELECT v.node,
         LEAST(p.dist,
               COALESCE((SELECT MIN(pp.dist) + 1 FROM sym e
                         JOIN d13 pp ON pp.node = e.u
                         WHERE e.v = v.node AND pp.dist < 1000000), 1000000)) AS dist
  FROM verts v JOIN d13 p ON p.node = v.node
),
keyed AS (
  SELECT v.node, d14.dist AS lvl, deg.deg
  FROM verts v JOIN d14 ON d14.node = v.node JOIN deg ON deg.node = v.node
),
cm AS (
  SELECT node, ROW_NUMBER() OVER (ORDER BY lvl, deg, node) - 1 AS r,
         COUNT(*) OVER () AS n
  FROM keyed
)
SELECT n - 1 - r AS vid, node AS label FROM cm
"""


def _scc_bowtie_sql() -> str:
    """q_scc_bowtie replay: a recursive-CTE transitive closure gives
    mutual-reachability (SCC labels = min mutual vertex, exactly the
    engine's min-member relabel), and closure from/to the giant SCC gives
    the Broder regions. Completely independent of the engine's
    trim/color/backward-BFS evaluation."""
    return """
WITH RECURSIVE de AS MATERIALIZED (
  SELECT DISTINCT s, d FROM (
    SELECT (l_partkey*3 + l_suppkey) % 200 AS s,
           CASE WHEN l_orderkey % 7 = 0
                THEN GREATEST(0, (l_partkey*3 + l_suppkey) % 200 - l_orderkey % 60)
                ELSE LEAST(199, (l_partkey*3 + l_suppkey) % 200 + 1 + l_orderkey % 25)
           END AS d
    FROM lineitem WHERE l_orderkey % 80 = 0
  ) WHERE s <> d
),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT s AS v FROM de UNION ALL SELECT d FROM de)
),
reach AS (
  SELECT s, d FROM de
  UNION
  SELECT r.s, e.d FROM reach r JOIN de e ON r.d = e.s
),
mutual AS MATERIALIZED (
  SELECT a.s AS v, a.d AS w FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
),
scc AS MATERIALIZED (
  SELECT v.v, LEAST(v.v, COALESCE(MIN(m.w), v.v)) AS scc
  FROM verts v LEFT JOIN mutual m ON m.v = v.v GROUP BY v.v
),
sizes AS MATERIALIZED (SELECT scc, COUNT(*) AS n FROM scc GROUP BY scc),
giant AS (SELECT scc FROM sizes ORDER BY n DESC, scc LIMIT 1),
core AS MATERIALIZED (SELECT v FROM scc WHERE scc = (SELECT scc FROM giant)),
fwd AS MATERIALIZED (
  SELECT v FROM core
  UNION SELECT r.d AS v FROM reach r JOIN core c ON r.s = c.v
),
rev AS MATERIALIZED (
  SELECT v FROM core
  UNION SELECT r.s AS v FROM reach r JOIN core c ON r.d = c.v
),
outs AS MATERIALIZED (SELECT v FROM fwd WHERE v NOT IN (SELECT v FROM core)),
ins  AS MATERIALIZED (SELECT v FROM rev WHERE v NOT IN (SELECT v FROM core)),
rest AS MATERIALIZED (
  SELECT v.v FROM verts v
  WHERE v.v NOT IN (SELECT v FROM fwd) AND v.v NOT IN (SELECT v FROM rev)
),
from_in AS MATERIALIZED (
  SELECT DISTINCT r.d AS v FROM reach r
  JOIN ins i ON r.s = i.v JOIN rest t ON r.d = t.v
),
to_out AS MATERIALIZED (
  SELECT DISTINCT r.s AS v FROM reach r
  JOIN outs o ON r.d = o.v JOIN rest t ON r.s = t.v
)
SELECT CAST(v.v AS BIGINT) AS node, CAST(s.scc AS BIGINT) AS scc,
       CAST(sz.n AS BIGINT) AS scc_size,
       CASE WHEN v.v IN (SELECT v FROM core) THEN 'SCC'
            WHEN v.v IN (SELECT v FROM ins) THEN 'IN'
            WHEN v.v IN (SELECT v FROM outs) THEN 'OUT'
            WHEN v.v IN (SELECT v FROM from_in)
                 AND v.v IN (SELECT v FROM to_out) THEN 'TUBE'
            WHEN v.v IN (SELECT v FROM from_in) THEN 'TENDRIL_IN'
            WHEN v.v IN (SELECT v FROM to_out) THEN 'TENDRIL_OUT'
            ELSE 'DISC' END AS region
FROM verts v JOIN scc s ON s.v = v.v JOIN sizes sz ON sz.scc = s.scc
"""


def _degree_peel(prefix: str, src_cte: str, k: int, rounds: int) -> str:
    """SQL fragment: ``rounds`` degree-peel rounds at threshold ``k`` over
    ``src_cte`` (u, v); surviving set is ``{prefix}{rounds}``. Idempotent
    past the fixpoint, so ``rounds`` just needs to cover it."""
    parts = [f",\n{prefix}0 AS MATERIALIZED (SELECT u, v FROM {src_cte})"]
    for r in range(rounds):
        parts.append(
            f""",
{prefix}deg{r} AS (
  SELECT x AS vid, COUNT(*) AS dg FROM (
    SELECT u AS x FROM {prefix}{r} UNION ALL SELECT v FROM {prefix}{r}
  ) GROUP BY x
),
{prefix}bad{r} AS (SELECT vid FROM {prefix}deg{r} WHERE dg < {k}),
{prefix}{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prefix}{r} e
  WHERE e.u NOT IN (SELECT vid FROM {prefix}bad{r})
    AND e.v NOT IN (SELECT vid FROM {prefix}bad{r})
)"""
        )
    return "".join(parts)


def _kcore_sql() -> str:
    """q_kcore replay over the sampled graph_s: unrolled degree-peel
    fixpoints per level (1-core = the graph itself; empirically the
    2-core needs 4 rounds and the 3-core empties in 17 at sf0.01 — the
    padded counts guard the fixpoint claim, extra rounds are idempotent).
    core(v) = highest level whose surviving edge set still touches v."""
    return (
        """WITH se AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % 1201, (l_partkey*7+l_suppkey) % 1201) AS u,
                  GREATEST(l_orderkey % 1201, (l_partkey*7+l_suppkey) % 1201) AS v
  FROM lineitem
  WHERE l_orderkey % 40 = 0
    AND l_orderkey % 1201 <> (l_partkey*7+l_suppkey) % 1201
)"""
        + _degree_peel("c2_", "se", 2, 10)
        + _degree_peel("c3_", "c2_10", 3, 24)
        + """,
verts AS (SELECT DISTINCT x AS node FROM (SELECT u AS x FROM se UNION ALL SELECT v FROM se)),
in2 AS (SELECT DISTINCT x AS node FROM (SELECT u AS x FROM c2_10 UNION ALL SELECT v FROM c2_10)),
in3 AS (SELECT DISTINCT x AS node FROM (SELECT u AS x FROM c3_24 UNION ALL SELECT v FROM c3_24))
SELECT v.node,
       CAST(CASE WHEN v.node IN (SELECT node FROM in3) THEN 3
                 WHEN v.node IN (SELECT node FROM in2) THEN 2
                 ELSE 1 END AS BIGINT) AS core
FROM verts v
"""
    )


def _bfs_sssp_sql(bf_rounds: int) -> str:
    """q_bfs replay: recursive-CTE hop BFS plus ``bf_rounds`` unrolled
    Bellman–Ford relaxations over the weighted symmetric graph-A edge
    table (weight = duplicate multiplicity, exactly Graph.from_edges'
    symmetrize+sum). The fixpoint lands by round 5 at sf0.001 and round 4
    at sf0.01 (probed); 8 rounds is the safety margin, and
    tests/test_entry.py pins Spark == oracle on both SFs."""
    parts = [
        f"""WITH RECURSIVE {_A_EDGES},
wsym AS MATERIALIZED (
  SELECT u, v, SUM(w) AS w FROM (
    SELECT l_partkey AS u, 100000 + l_suppkey AS v, 1.0 AS w FROM lineitem
    UNION ALL
    SELECT 100000 + l_suppkey AS u, l_partkey AS v, 1.0 AS w FROM lineitem
  ) GROUP BY u, v
),
src AS (SELECT MIN(u) AS s FROM edges),
bf(node, d) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT s.v, bf.d + 1 FROM bf JOIN sym s ON s.u = bf.node WHERE bf.d < 15
),
bfd AS MATERIALIZED (
  SELECT v.node, COALESCE(MIN(bf.d), -1) AS depth
  FROM verts v LEFT JOIN bf ON v.node = bf.node
  GROUP BY v.node
),
d0 AS MATERIALIZED (SELECT s AS node, 0.0 AS dist FROM src)"""
    ]
    for i in range(1, bf_rounds + 1):
        parts.append(
            f""",
d{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{i-1}
    UNION ALL
    SELECT e.v AS node, d.dist + e.w FROM d{i-1} d JOIN wsym e ON e.u = d.node
  ) GROUP BY node
)"""
        )
    parts.append(
        f"""
SELECT b.node, b.depth, ROUND(COALESCE(d.dist, -1.0), 6) AS wdist
FROM bfd b LEFT JOIN d{bf_rounds} d ON b.node = d.node
"""
    )
    return "".join(parts)


def _hits_sql(iters: int) -> str:
    """q_hits5 replay: unrolled alternating sum-normalized HITS updates
    over the distinct directed graph-A edges (operators/hits.py
    semantics; same unrolled-CTE family as the PageRank oracle), plus an
    unrolled eigenvector power iteration (x' = L2-normalize(x + A^T x),
    operators/eigenvector.py) over the same edge set, plus unrolled
    SALSA (degree-normalized alternating walk updates,
    operators/salsa.py: auth'(j)=Σ hub(i)/outdeg(i), hub'(i)=Σ
    auth(j)/indeg(j), each half-step sum-renormalized) — merged like the
    Spark-side q_hits5."""
    parts = [
        """WITH e AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS u, 100000 + l_suppkey AS v FROM lineitem
),
verts AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
h0 AS MATERIALIZED (
  SELECT node, 1.0/(SELECT n FROM nn) AS hub, 1.0/(SELECT n FROM nn) AS auth
  FROM verts
),
x0 AS MATERIALIZED (SELECT node, 1.0/(SELECT n FROM nn) AS x FROM verts),
se AS MATERIALIZED (
  SELECT e.u, e.v, 1.0 / od.c AS w_fwd, 1.0 / id.c AS w_bwd
  FROM e
  JOIN (SELECT u, CAST(COUNT(*) AS DOUBLE) AS c FROM e GROUP BY u) od
    ON e.u = od.u
  JOIN (SELECT v, CAST(COUNT(*) AS DOUBLE) AS c FROM e GROUP BY v) id
    ON e.v = id.v
),
s0 AS MATERIALIZED (
  SELECT node, 1.0/(SELECT n FROM nn) AS hub, 1.0/(SELECT n FROM nn) AS auth
  FROM verts
),
k0 AS MATERIALIZED (SELECT node, 0.0 AS x FROM verts)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
ar{i} AS (
  SELECT e.v AS node, SUM(p.hub) AS a
  FROM e JOIN h{i-1} p ON e.u = p.node GROUP BY e.v
),
af{i} AS MATERIALIZED (
  SELECT v.node, COALESCE(ar.a, 0.0) AS auth
  FROM verts v LEFT JOIN ar{i} ar ON v.node = ar.node
),
at{i} AS (SELECT SUM(auth) AS t FROM af{i}),
an{i} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT t FROM at{i}) > 0
                    THEN auth / (SELECT t FROM at{i}) ELSE 0.0 END AS auth
  FROM af{i}
),
hr{i} AS (
  SELECT e.u AS node, SUM(a.auth) AS h
  FROM e JOIN an{i} a ON e.v = a.node GROUP BY e.u
),
hf{i} AS MATERIALIZED (
  SELECT v.node, COALESCE(hr.h, 0.0) AS hub
  FROM verts v LEFT JOIN hr{i} hr ON v.node = hr.node
),
ht{i} AS (SELECT SUM(hub) AS t FROM hf{i}),
h{i} AS MATERIALIZED (
  SELECT hf.node,
         CASE WHEN (SELECT t FROM ht{i}) > 0
              THEN hf.hub / (SELECT t FROM ht{i}) ELSE 0.0 END AS hub,
         an.auth
  FROM hf{i} hf JOIN an{i} an ON hf.node = an.node
),
xr{i} AS (
  SELECT e.v AS node, SUM(p.x) AS c
  FROM e JOIN x{i-1} p ON e.u = p.node GROUP BY e.v
),
xf{i} AS MATERIALIZED (
  SELECT v.node, x.x + COALESCE(xr.c, 0.0) AS x
  FROM verts v JOIN x{i-1} x ON v.node = x.node
  LEFT JOIN xr{i} xr ON v.node = xr.node
),
xt{i} AS (SELECT SQRT(SUM(x * x)) AS t FROM xf{i}),
x{i} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT t FROM xt{i}) > 0
                    THEN x / (SELECT t FROM xt{i}) ELSE 0.0 END AS x
  FROM xf{i}
),
sar{i} AS (
  SELECT se.v AS node, SUM(p.hub * se.w_fwd) AS a
  FROM se JOIN s{i-1} p ON se.u = p.node GROUP BY se.v
),
saf{i} AS MATERIALIZED (
  SELECT v.node, COALESCE(ar.a, 0.0) AS auth
  FROM verts v LEFT JOIN sar{i} ar ON v.node = ar.node
),
sat{i} AS (SELECT SUM(auth) AS t FROM saf{i}),
san{i} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT t FROM sat{i}) > 0
                    THEN auth / (SELECT t FROM sat{i}) ELSE 0.0 END AS auth
  FROM saf{i}
),
shr{i} AS (
  SELECT se.u AS node, SUM(a.auth * se.w_bwd) AS h
  FROM se JOIN san{i} a ON se.v = a.node GROUP BY se.u
),
shf{i} AS MATERIALIZED (
  SELECT v.node, COALESCE(hr.h, 0.0) AS hub
  FROM verts v LEFT JOIN shr{i} hr ON v.node = hr.node
),
sht{i} AS (SELECT SUM(hub) AS t FROM shf{i}),
s{i} AS MATERIALIZED (
  SELECT hf.node,
         CASE WHEN (SELECT t FROM sht{i}) > 0
              THEN hf.hub / (SELECT t FROM sht{i}) ELSE 0.0 END AS hub,
         an.auth
  FROM shf{i} hf JOIN san{i} an ON hf.node = an.node
),
kr{i} AS (
  SELECT e.v AS node, SUM(p.x) AS c
  FROM e JOIN k{i-1} p ON e.u = p.node GROUP BY e.v
),
k{i} AS MATERIALIZED (
  SELECT v.node, 0.1 * COALESCE(kr.c, 0.0) + 1.0 AS x
  FROM verts v LEFT JOIN kr{i} kr ON v.node = kr.node
)"""
        )
    parts.append(
        f"""
, kt AS (SELECT SQRT(SUM(x * x)) AS t FROM k{iters})
SELECT h.node, ROUND(h.hub, 9) AS hub, ROUND(h.auth, 9) AS auth,
       ROUND(x.x, 9) AS eig,
       ROUND(s.hub, 9) AS salsa_hub, ROUND(s.auth, 9) AS salsa_auth,
       ROUND(CASE WHEN (SELECT t FROM kt) > 0
                  THEN k.x / (SELECT t FROM kt) ELSE 0.0 END, 9) AS katz
FROM h{iters} h JOIN x{iters} x ON h.node = x.node
JOIN s{iters} s ON h.node = s.node
JOIN k{iters} k ON h.node = k.node"""
    )
    return "".join(parts)


def _walk_replay_sql(walk_length: int, seed: int) -> str:
    """q_random_walks replay: the closed-form 60-vertex digraph and the
    per-step argmin-xxhash64 neighbor draws are all data-independent, so
    the entire expected corpus is computed host-side through the pure-
    Python XXH64 port (functions/xxh64.py, bit-exact vs Spark by test)
    and inlined as literals — the same replay discipline as the
    web_pagerank / media_features oracles."""
    from arkouda_njit_spark.functions.xxh64 import spark_xxhash64

    adj: dict[int, list[int]] = {}
    for s, d in _walk_edge_pairs():
        adj.setdefault(s, []).append(d)
    rows = []
    for v in range(_WALK_N):
        path = [v]
        cur = v
        for t in range(1, walk_length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(
                nbrs,
                key=lambda d: spark_xxhash64(
                    ("long", v), ("int", t), ("long", d), ("int", seed)
                ),
            )
            path.append(cur)
        rows.append((v, " ".join(str(x) for x in path)))
    values = ",".join(f"({w},'{s}')" for w, s in rows)
    return (
        f"SELECT CAST(walk_id AS BIGINT) AS walk_id, sentence\n"
        f"FROM (VALUES {values}) t(walk_id, sentence)"
    )


def _paragraph_dedup_sql() -> str:
    """q_paragraph_dedup replay: rebuild the 3-paragraph corpus, explode
    with ordinality, digest-count whitespace-normalized paragraphs, keep
    each >=2-occurrence paragraph only at its smallest (doc_id, pos), and
    reassemble — the full functions/dedup.py paragraph_dedup pipeline."""
    return f"""
WITH {_DOCS_DUP},
corpus AS MATERIALIZED (
  SELECT doc_id,
         text || chr(10) || chr(10) || 'Subscribe to our newsletter today'
              || chr(10) || chr(10) || substr(text, 1, 40) AS text
  FROM docsdup
),
exploded AS (
  SELECT doc_id,
         unnest(list_transform(regexp_split_to_array(text, '\\n\\n'),
                               (x, i) -> {{'pos': i - 1, 'para': x}})) AS u
  FROM corpus
),
paras AS MATERIALIZED (
  SELECT doc_id, u.pos AS pos, u.para AS para,
         md5(trim(regexp_replace(u.para, '\\s+', ' ', 'g'))) AS pkey
  FROM exploded
),
stats AS MATERIALIZED (SELECT pkey, COUNT(*) AS n_occ FROM paras GROUP BY pkey),
ranked AS MATERIALIZED (
  SELECT doc_id, pos, para, pkey,
         ROW_NUMBER() OVER (PARTITION BY pkey ORDER BY doc_id, pos) AS rn
  FROM paras
),
flagged AS (
  SELECT r.doc_id, r.pos, r.para,
         (s.n_occ < 2 OR r.rn = 1) AS keep_para
  FROM ranked r JOIN stats s USING (pkey)
),
agg AS (
  SELECT doc_id,
         COALESCE(string_agg(para, chr(10) || chr(10) ORDER BY pos)
                  FILTER (WHERE keep_para), '') AS text_dedup,
         SUM(CASE WHEN keep_para THEN 0 ELSE 1 END) AS n_paras_removed
  FROM flagged GROUP BY doc_id
)
SELECT c.doc_id, a.text_dedup, CAST(a.n_paras_removed AS BIGINT) AS n_paras_removed
FROM corpus c JOIN agg a USING (doc_id)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "build_edges": """
SELECT l_partkey AS u, 100000 + l_suppkey AS v,
       CAST(COUNT(*) AS DOUBLE) AS weight
FROM lineitem GROUP BY 1, 2
""",
        "degree": f"""
WITH {_A_EDGES},
od AS (SELECT u AS node, COUNT(*) AS c FROM edges GROUP BY u)
SELECT d.node, d.deg AS degree, COALESCE(od.c, 0) AS out_degree
FROM deg d LEFT JOIN od ON d.node = od.node
""",
        "relabel": f"""
SELECT 'degree_sort' AS method, vid, label FROM (
  WITH {_A_EDGES}
  SELECT ROW_NUMBER() OVER (ORDER BY deg, node) - 1 AS vid, node AS label
  FROM deg
)
UNION ALL
SELECT 'rcm' AS method, vid, label FROM ({_RCM_SQL})
""",
        "density": f"""
WITH {_A_EDGES},
m AS (SELECT COUNT(*) AS m FROM edges)
SELECT (SELECT n FROM nn) AS n_vertices,
       (SELECT m FROM m) AS n_edges,
       ROUND(2.0 * (SELECT m FROM m) /
             ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1)), 9) AS density
""",
        "triangle_count": f"""
WITH {_B_EDGES}
SELECT COUNT(*) AS triangles
FROM und ab JOIN und ac ON ab.u = ac.u AND ab.v < ac.v
            JOIN und bc ON bc.u = ab.v AND bc.v = ac.v
""",
        "squares": f"""
WITH {_B_EDGES},
wed AS (
  SELECT s1.v AS a, s2.v AS b, COUNT(*) AS c
  FROM bsym s1 JOIN bsym s2 ON s1.u = s2.u AND s1.v < s2.v
  GROUP BY s1.v, s2.v
)
SELECT CAST(COALESCE(SUM(c * (c - 1)), 0) / 4 AS BIGINT) AS squares FROM wed
""",
        "pagerank5": _unrolled_pagerank(5),
        "pagerank3_weighted": _unrolled_pagerank_weighted(3),
        "connected_components": _unrolled_cc(12).replace(
            "SELECT node, comp AS component FROM cc12",
            "SELECT node, comp AS component,"
            " COUNT(*) OVER (PARTITION BY comp) AS size FROM cc12",
        ),
        "lpa4": _unrolled_lpa(4),
        "bfs": _bfs_sssp_sql(8),
        "complete_graph": """
SELECT a.range AS src, b.range AS dst
FROM range(8) a, range(8) b WHERE a.range < b.range
""",
        "text_stats": f"""
WITH {_SHINGLES},
fp AS (SELECT doc_id, MIN(md5(s)) AS fingerprint FROM sh GROUP BY doc_id),
post AS MATERIALIZED (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (
    SELECT doc_id, regexp_replace(u, '[^a-z0-9]', '', 'g') AS t
    FROM (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS u
      FROM docs
    )
  )
  WHERE t <> '' GROUP BY doc_id, t
),
dl AS MATERIALIZED (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY doc_id),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
dfq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post
  WHERE term IN ('data','quality','web') GROUP BY term
),
bm AS MATERIALIZED (
  SELECT p.doc_id,
         SUM(
           ln(1.0 + ((SELECT n FROM st) - dfq.df + 0.5) / (dfq.df + 0.5))
           * p.tf * 2.2
           / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM st)))
         ) AS score
  FROM post p JOIN dfq USING (term) JOIN dl USING (doc_id)
  GROUP BY p.doc_id
),
m AS (
  SELECT doc_id,
         length(text) AS nc,
         len(regexp_split_to_array(trim(text), '\\s+')) AS nt,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS na,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM docs
),
hits AS (
  SELECT doc_id, nc, nt, na, np,
    len(list_intersect(t, ['the','and','of','to','in','is','for','with','that','this'])) AS h_en,
    len(list_intersect(t, ['der','die','das','und','ist','nicht','mit','ein','eine','zu'])) AS h_de,
    len(list_intersect(t, ['le','la','les','et','est','pour','dans','une','que','des'])) AS h_fr
  FROM m
)
SELECT doc_id,
  CAST(nt AS BIGINT) AS n_tokens,
  ROUND(
    (CASE WHEN nc >= 20 AND nc <= 100000 THEN 0.25 ELSE 0 END) +
    (CASE WHEN nc > 0 AND na * 1.0 / nc >= 0.6 THEN 0.25 ELSE 0 END) +
    (CASE WHEN nc > 0 AND np * 1.0 / nc <= 0.1 THEN 0.25 ELSE 0 END) +
    (CASE WHEN nt > 0 AND nc * 1.0 / nt >= 3 AND nc * 1.0 / nt <= 12
          THEN 0.25 ELSE 0 END), 6) AS quality,
  CASE WHEN GREATEST(h_en, h_de, h_fr) = 0 THEN 'und'
       WHEN h_de = GREATEST(h_en, h_de, h_fr) THEN 'de'
       WHEN h_en = GREATEST(h_en, h_de, h_fr) THEN 'en'
       ELSE 'fr' END AS lang_pred,
  fp.fingerprint,
  ROUND(COALESCE(bm.score, 0.0), 9) AS bm25_dqw
FROM hits JOIN fp USING (doc_id) LEFT JOIN bm USING (doc_id)
""",
        "exact_dups": f"""
WITH {_DOCS_DUP}
SELECT md5(text) AS content_hash,
       COUNT(*) AS n_docs,
       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids_csv
FROM docsdup GROUP BY md5(text) HAVING COUNT(*) >= 2
""",
        "louvain": """
SELECT CAST(range AS BIGINT) AS vid,
       CAST((range // 12) * 12 AS BIGINT) AS community
FROM range(144)
""",
        "strings": f"""
WITH {_DOCS},
base AS MATERIALIZED (
  SELECT doc_id, substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 48) AS s
  FROM docs WHERE doc_id % 20 = 0
),
sa AS MATERIALIZED (
  SELECT doc_id,
       array_to_string(
         list_transform(
           list_sort(list_transform(generate_series(1, length(s)),
                                    i -> {{'suf': s[i:], 'i': i}})),
           x -> CAST(x.i - 1 AS INT)), ',') AS suffix_array_csv
  FROM base
),
pa AS MATERIALIZED (
  SELECT doc_id, substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 32) AS a
  FROM docs WHERE doc_id % 20 = 0
),
pb AS MATERIALIZED (
  SELECT doc_id - 10 AS doc_id,
         substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 32) AS b
  FROM docs WHERE doc_id % 20 = 10
),
-- candidates sorted by (length DESC, end ASC): first element reproduces the
-- rolling-DP scan-order tie-break (earliest maximal occurrence in a)
lcs AS MATERIALIZED (
  SELECT pa.doc_id,
       coalesce(
         list_sort(
           list_filter(
             flatten(list_transform(generate_series(1, length(a)), i ->
               list_transform(generate_series(i, length(a)), j ->
                 {{'negl': i - j - 1, 'e': j, 'sub': a[i:j]}}))),
             x -> contains(b, x.sub)))[1].sub, '') AS lcs
  FROM pa JOIN pb USING (doc_id)
)
SELECT sa.doc_id, sa.suffix_array_csv, COALESCE(l.lcs, '') AS lcs
FROM sa LEFT JOIN lcs l ON sa.doc_id = l.doc_id
""",
        "ngram_jaccard": f"""
WITH {_DOCS_DUP},
njt AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM docsdup WHERE doc_id % 1000000 < 100
),
-- no whole-text fallback: ngram_jaccard_pairs defaults
-- fallback_whole_text=False, so docs shorter than n contribute nothing
njsh AS (
  SELECT doc_id,
         unnest([array_to_string(t[i+1:i+3], ' ') for i in range(len(t)-2)]) AS s
  FROM njt WHERE len(t) >= 3
),
shd AS (SELECT DISTINCT doc_id, s FROM njsh),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS common
  FROM shd l JOIN shd r ON l.s = r.s AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
)
SELECT a, b,
       ROUND(common * 1.0 / (sa.sz + sb.sz - common), 9) AS jaccard
FROM inter JOIN sz sa ON inter.a = sa.doc_id
           JOIN sz sb ON inter.b = sb.doc_id
WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5
""",
        "minhash_near_dups": _minhash_near_dup_sql(16, 8, 0.7),
        # dim=64 matches the sf0.01 embeddings table the driver compares at
        "ann_topk": _ann_lsh_sql(dim=64, k=5, n_planes=6, n_tables=4),
        "embedding_near_dups": _embedding_near_dup_sql(
            dim=64, exact_threshold=0.8, exact_subset=150,
            lsh_threshold=0.9, n_planes=6,
        ),
        "web_pagerank": _web_pagerank_sql(
            n_pages=500, links_per_page=8, seed=42, iters=20, topk=25
        ),
        "media_features": _media_features_sql(n=120, seed=42, dim=16),
        "gopher_flags": f"""
WITH {_DOCS},
m AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS t,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         len(regexp_split_to_array(text, '\\.\\.\\.')) - 1 AS n_ellipsis,
         regexp_split_to_array(text, '\\n') AS lines
  FROM docs
),
f AS (
  SELECT doc_id,
         len(t) AS nw,
         CASE WHEN len(t) > 0
              THEN list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t)
              ELSE 0.0 END AS mw,
         CASE WHEN len(t) > 0 THEN (n_hash + n_ellipsis) * 1.0 / len(t)
              ELSE 0.0 END AS sym,
         CASE WHEN len(lines) > 0
              THEN len(list_filter(lines, ln -> regexp_matches(trim(ln), '^[-*•]')))
                   * 1.0 / len(lines)
              ELSE 0.0 END AS bul,
         CASE WHEN len(t) > 0
              THEN len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
                   * 1.0 / len(t)
              ELSE 0.0 END AS alw
  FROM m
)
SELECT doc_id,
       (nw >= 50 AND nw <= 100000) AS flag_word_count,
       (mw >= 3 AND mw <= 10) AS flag_mean_word,
       (sym <= 0.1) AS flag_symbol_ratio,
       (bul < 0.9) AS flag_bullet_lines,
       (alw >= 0.8) AS flag_alpha_words,
       ((nw >= 50 AND nw <= 100000) AND (mw >= 3 AND mw <= 10)
        AND (sym <= 0.1) AND (bul < 0.9) AND (alw >= 0.8)) AS gopher_keep
FROM f
""",
        "host_graph": _host_graph_sql(n_pages=500, links_per_page=8, seed=42),
        "simhash": f"""
WITH {_DOCS},
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tk
  FROM docs
),
h AS (SELECT doc_id, CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) AS h FROM tok),
bitsums AS (
  SELECT doc_id, b.range AS b,
         SUM(CASE WHEN (h.h >> CAST(b.range AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, range(32) b
  GROUP BY doc_id, b.range
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT)
                ELSE 0 END) AS BIGINT) AS simhash
FROM bitsums GROUP BY doc_id
""",
        # IVF with exhaustive probing returns the exact top-k: same oracle
        "ann_ivf_exhaustive": """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.qv AS DOUBLE[])) AS cos
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, ROUND(CAST(cos AS DOUBLE), 6) AS cosine
FROM ranked WHERE rn <= 5
""",
        "embedding_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.qv AS DOUBLE[])) AS cos
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, ROUND(CAST(cos AS DOUBLE), 6) AS cosine
FROM ranked WHERE rn <= 5
""",
        "events_rollup": """
SELECT 'hourly' AS section,
       CAST(date_trunc('hour', ts) AS VARCHAR) AS k1,
       event_type AS k2, COUNT(*) AS n, ROUND(SUM(value), 6) AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'top' AS section, event_type AS k1,
       CAST(user_id AS VARCHAR) AS k2, rank AS n, total_value
FROM (
  SELECT event_type, user_id, total_value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY total_value DESC, user_id) AS rank
  FROM (
    SELECT event_type, user_id, ROUND(SUM(value), 6) AS total_value
    FROM events GROUP BY 1, 2
  )
) WHERE rank <= 3
""",
        "sessionize": """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts, 1, ts)
              OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
marked AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 1800 SECOND, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM marked GROUP BY user_id, sid
""",
        "mono_3cycle": """
WITH de AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % 211 AS s, (l_partkey * 7 + l_suppkey) % 211 AS d
  FROM lineitem WHERE l_orderkey % 211 <> (l_partkey * 7 + l_suppkey) % 211
)
SELECT COUNT(*) AS n_embeddings
FROM de e1 JOIN de e2 ON e1.d = e2.s
           JOIN de e3 ON e2.d = e3.s AND e3.d = e1.s
WHERE e1.s <> e2.d AND e1.s <> e1.d AND e2.s <> e2.d
""",
        "bpe_tokens": f"""
WITH {_DOCS}
SELECT doc_id,
       CAST(len(regexp_extract_all(trim(text), '[0-9A-Za-z_]+'))
            + length(regexp_replace(text, '[0-9A-Za-z_\\s]', '', 'g'))
            AS BIGINT) AS n_bpe_tokens
FROM docs
""",
        "url_canonicalize": """
WITH messy AS (
  SELECT DISTINCT 'HTTP://Site' || CAST(l_partkey % 50 AS VARCHAR) || '.Example'
         || (CASE WHEN l_orderkey % 3 = 0 THEN ':80' ELSE '' END)
         || '/Path' || CAST(l_orderkey % 100 AS VARCHAR)
         || (CASE WHEN l_suppkey % 2 = 0 THEN '#frag' ELSE '' END) AS url
  FROM lineitem
),
nofrag AS (SELECT url, regexp_replace(trim(url), '#.*$', '') AS u FROM messy),
lowered AS (
  SELECT url,
         CASE WHEN regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) <> ''
              THEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
                   || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
              ELSE u END AS u
  FROM nofrag
)
SELECT url,
       regexp_replace(regexp_replace(u, '^(http://[^/?#:]+):80([/?#]|$)', '\\1\\2'),
                      '^(https://[^/?#:]+):443([/?#]|$)', '\\1\\2') AS canonical
FROM lowered
""",
        "triad_census": _triad_census_sql(),
        "jaccard": """
WITH
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % 301, l_partkey % 301) AS u,
                  GREATEST(l_orderkey % 301, l_partkey % 301) AS v
  FROM lineitem
  WHERE l_orderkey % 301 <> l_partkey % 301
),
bsym AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS d FROM bsym GROUP BY u),
common AS MATERIALIZED (
  SELECT s1.v AS a, s2.v AS b,
         COUNT(*) AS c,
         SUM(1.0 / LN(dm.d)) AS aa,
         SUM(1.0 / dm.d) AS ra
  FROM bsym s1
  JOIN bsym s2 ON s1.u = s2.u AND s1.v < s2.v
  JOIN deg dm ON s1.u = dm.node
  GROUP BY s1.v, s2.v
)
SELECT a AS u, b AS v,
       c AS cn,
       ROUND(c * 1.0 / (da.d + db.d - c), 9) AS jaccard,
       ROUND(aa, 9) AS adamic_adar,
       ROUND(ra, 9) AS resource_allocation,
       da.d * db.d AS pref_attach
FROM common JOIN deg da ON common.a = da.node
            JOIN deg db ON common.b = db.node
WHERE c * 1.0 / (da.d + db.d - c) >= 0.5
""",
        "clean_corpus": """
WITH docs AS (SELECT * FROM documents WHERE length(trim(text)) > 0),
m AS (
  SELECT doc_id, text,
         length(text) AS nc,
         len(regexp_split_to_array(trim(text), '\\s+')) AS nt,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS na,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS np,
         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM docs
),
scored AS (
  SELECT doc_id, text,
    (CASE WHEN nc >= 20 AND nc <= 100000 THEN 0.25 ELSE 0 END) +
    (CASE WHEN nc > 0 AND na * 1.0 / nc >= 0.6 THEN 0.25 ELSE 0 END) +
    (CASE WHEN nc > 0 AND np * 1.0 / nc <= 0.1 THEN 0.25 ELSE 0 END) +
    (CASE WHEN nt > 0 AND nc * 1.0 / nt >= 3 AND nc * 1.0 / nt <= 12
          THEN 0.25 ELSE 0 END) AS quality,
    len(list_intersect(t, ['the','and','of','to','in','is','for','with','that','this'])) AS h_en,
    len(list_intersect(t, ['der','die','das','und','ist','nicht','mit','ein','eine','zu'])) AS h_de,
    len(list_intersect(t, ['le','la','les','et','est','pour','dans','une','que','des'])) AS h_fr
  FROM m
),
langed AS (
  SELECT doc_id, text, quality,
    CASE WHEN GREATEST(h_en, h_de, h_fr) = 0 THEN 'und'
         WHEN h_de = GREATEST(h_en, h_de, h_fr) THEN 'de'
         WHEN h_en = GREATEST(h_en, h_de, h_fr) THEN 'en'
         ELSE 'fr' END AS lang_pred
  FROM scored
),
kept AS (
  SELECT doc_id, quality, lang_pred,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM langed
  WHERE quality >= 0.5 AND lang_pred = 'en'
)
SELECT doc_id, ROUND(quality, 6) AS quality, lang_pred FROM kept WHERE rn = 1
""",
        "edge_support": """
WITH
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(l_orderkey % 301, l_partkey % 301) AS u,
                  GREATEST(l_orderkey % 301, l_partkey % 301) AS v
  FROM lineitem
  WHERE l_orderkey % 301 <> l_partkey % 301
),
tri AS MATERIALIZED (
  SELECT ab.u AS a, ab.v AS b, ac.v AS c
  FROM und ab JOIN und ac ON ab.u = ac.u AND ab.v < ac.v
              JOIN und bc ON bc.u = ab.v AND bc.v = ac.v
),
sup AS (
  SELECT x AS u, y AS v, COUNT(*) AS s FROM (
    SELECT a AS x, b AS y FROM tri
    UNION ALL SELECT a, c FROM tri
    UNION ALL SELECT b, c FROM tri
  ) GROUP BY x, y
)
SELECT und.u, und.v, COALESCE(sup.s, 0) AS support
FROM und LEFT JOIN sup ON und.u = sup.u AND und.v = sup.v
""",
        "ktruss5": _unrolled_ktruss(5, 6),
        "truss_decomposition": f"""
WITH decomp AS ({_TRUSS_DECOMP_SQL})
SELECT u, v, truss,
       CAST(MAX(truss) OVER () AS BIGINT) AS max_truss
FROM decomp
""",
        "diameter_path": """
WITH verts AS MATERIALIZED (
  SELECT DISTINCT l_partkey % 701 AS v FROM lineitem WHERE l_quantity > 47
),
runs AS (SELECT v, v - ROW_NUMBER() OVER (ORDER BY v) AS grp FROM verts),
lens AS (SELECT grp, COUNT(*) AS len FROM runs GROUP BY grp)
-- reference convention: components with true diameter <= 2 (runs of
-- <= 3 vertices) contribute nothing (Diameter.chpl k<=1 continue)
SELECT CAST(COALESCE(MAX(len - 2), 0) AS BIGINT) AS diameter
FROM lens WHERE len >= 4
""",
        "triangle_centrality": f"""
WITH {_B_EDGES},
{_B_TRI},
tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM tri),
tall AS MATERIALIZED (
  SELECT v.node, COALESCE(cnt.t, 0) AS t FROM bverts v LEFT JOIN cnt ON v.node = cnt.node
),
te AS MATERIALIZED (
  SELECT DISTINCT x, y FROM (
    SELECT a AS x, b AS y FROM tri UNION ALL SELECT a, c FROM tri
    UNION ALL SELECT b, c FROM tri
  )
),
tes AS MATERIALIZED (SELECT x, y FROM te UNION ALL SELECT y AS x, x AS y FROM te),
nei AS MATERIALIZED (
  SELECT tes.x AS node, SUM(tall.t) AS nt FROM tes JOIN tall ON tes.y = tall.node
  GROUP BY tes.x
),
nbr AS MATERIALIZED (
  SELECT s.u AS node, SUM(tall.t) AS ns FROM bsym s JOIN tall ON s.v = tall.node
  GROUP BY s.u
)
SELECT a.node,
       ROUND((a.t + COALESCE(nbr.ns, 0) - (COALESCE(nei.nt, 0) + a.t) * 2.0 / 3.0)
             / (SELECT t FROM tt), 9) AS centrality
FROM tall a LEFT JOIN nei ON a.node = nei.node LEFT JOIN nbr ON a.node = nbr.node
""",
        "wcc_split": """
SELECT CAST(range AS BIGINT) AS vertex, CAST(range // 15 AS BIGINT) AS cluster
FROM range(300)
""",
        "filter_edges": f"""
WITH {_PG_ATTRS},
keep AS (SELECT nodes FROM na WHERE grp IN (0, 1))
SELECT CAST(e.src AS BIGINT) AS src, CAST(e.dst AS BIGINT) AS dst FROM ea e
WHERE e.rf IN ('A', 'N')
  AND e.src IN (SELECT nodes FROM keep)
  AND e.dst IN (SELECT nodes FROM keep)
""",
        "subgraph_view": f"""
WITH {_PG_ATTRS},
sel AS (SELECT nodes FROM na WHERE grp = 2)
SELECT DISTINCT CAST(e.src AS BIGINT) AS u, CAST(e.dst AS BIGINT) AS v FROM ea e
WHERE e.src IN (SELECT nodes FROM sel) OR e.dst IN (SELECT nodes FROM sel)
""",
        "triangles_subset": f"""
WITH {_B_EDGES},
{_B_TRI},
req(in_pos, node) AS (VALUES (0, 7), (1, 3), (2, 150), (3, 42), (4, 99999)),
found AS (SELECT r.in_pos, r.node FROM req r JOIN bverts b ON b.node = r.node),
pos AS (SELECT in_pos, node,
               ROW_NUMBER() OVER (ORDER BY in_pos) - 1 AS pos FROM found)
SELECT CAST(v.node AS BIGINT) AS node,
       CAST(COALESCE(c.t, 0) AS BIGINT) AS triangles,
       CAST(COALESCE(p.pos, -1) AS BIGINT) AS pos
FROM bverts v LEFT JOIN cnt c ON c.node = v.node
              LEFT JOIN pos p ON p.node = v.node
""",
        "scc_bowtie": _scc_bowtie_sql(),
        "kcore": _kcore_sql(),
        "hits5": _hits_sql(5),
        "random_walks": _walk_replay_sql(walk_length=8, seed=42),
        "paragraph_dedup": _paragraph_dedup_sql(),
        "clustering": f"""
WITH {_B_EDGES},
{_B_TRI},
deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS d FROM bsym GROUP BY u)
SELECT CAST(v.node AS BIGINT) AS node,
       CAST(COALESCE(c.t, 0) AS BIGINT) AS triangles,
       CAST(COALESCE(dg.d, 0) AS BIGINT) AS deg,
       ROUND(CASE WHEN COALESCE(dg.d, 0) >= 2
                  THEN 2.0 * COALESCE(c.t, 0) / (dg.d * (dg.d - 1.0))
                  ELSE 0.0 END, 9) AS clustering
FROM bverts v LEFT JOIN cnt c ON v.node = c.node
              LEFT JOIN deg dg ON v.node = dg.node
""",
    }
