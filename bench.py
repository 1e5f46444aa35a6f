"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set (the north rule's metric): PageRank (10 iterations,
edges/sec + iterations/hour), connected components, label propagation
(4 rounds), triangle count, plus the pipeline ops (MinHash near-dup,
exact dedup) over documents.

Usage: python bench.py [--scaling]  (--scaling additionally runs PageRank
at local[N] and local[4N] in separate JVMs and reports scaling efficiency;
see BASELINE.md's in-sandbox protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_ITERS = 10
# REPEAT > 1: run the whole query set K times in one session and report
# per-query MEDIANS plus spread — shared-VM noise (±25% run-to-run on this
# box) otherwise masquerades as perf regressions (BASELINE.md protocol).
REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "1"))


def warm_up(spark):
    """Untimed JVM warm-up before the timed region: exercises the parquet
    reader, whole-stage codegen, hash aggregation, broadcast + shuffle joins,
    sortWithinPartitions and the Arrow mapInPandas path on a ~20k-row slice,
    so the first timed query measures the kernel rather than JIT/classloading
    (~8-13s of one-time JVM cost otherwise lands in graph_build; see
    BASELINE.md). The timed protocol below is unchanged."""
    from pyspark.sql import functions as F

    from arkouda_njit_spark import Graph
    from arkouda_njit_spark.operators import pagerank

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(20000)
    g = Graph.from_edges(
        spark,
        li.select(
            F.pmod(F.col("l_orderkey"), F.lit(997)).alias("src"),
            F.pmod(F.col("l_partkey"), F.lit(997)).alias("dst"),
            F.lit(1.0).alias("weight"),
        ).filter(F.col("src") != F.col("dst")),
    )
    pagerank(g, tol=0.0, max_iterations=2).count()
    g.edges.unpersist()
    g.vertices.unpersist()
    spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(500).select(
        F.md5(F.col("text")).alias("h")
    ).groupBy("h").count().count()


def build_graphs(spark):
    from pyspark.sql import functions as F

    from arkouda_njit_spark import Graph

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ga = Graph.from_edges(
        spark,
        li.select(
            F.col("l_partkey").alias("src"),
            (F.lit(100000) + F.col("l_suppkey")).alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
    )
    gb = Graph.from_edges(
        spark,
        li.select(
            F.pmod(F.col("l_orderkey"), F.lit(3001)).alias("src"),
            F.pmod(F.col("l_partkey"), F.lit(3001)).alias("dst"),
            F.lit(1.0).alias("weight"),
        ).filter(F.col("src") != F.col("dst")),
    )
    # force builds so per-query timings measure the kernels
    ga.n_edges, gb.n_edges
    return ga, gb


def run_queries(spark) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from arkouda_njit_spark.functions import exact_duplicates, minhash_near_duplicates
    from arkouda_njit_spark.operators import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    t0 = time.time()
    ga, gb = build_graphs(spark)
    timings["graph_build"] = time.time() - t0
    sym_edges = ga.edges.count()

    t0 = time.time()
    pagerank(ga, tol=0.0, max_iterations=PR_ITERS).count()
    pr_sec = time.time() - t0
    timings["pagerank10"] = pr_sec
    extras["pagerank_iters_per_hour"] = PR_ITERS / pr_sec * 3600
    extras["pagerank_edges_per_sec"] = sym_edges * PR_ITERS / pr_sec

    t0 = time.time()
    connected_components(ga).count()
    timings["connected_components"] = time.time() - t0

    t0 = time.time()
    label_propagation(ga, max_iterations=4).count()
    timings["lpa4"] = time.time() - t0

    t0 = time.time()
    triangle_count(gb)
    timings["triangle_count"] = time.time() - t0

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.length(F.trim("text")) > 0
    )
    t0 = time.time()
    exact_duplicates(docs).count()
    timings["exact_dedup"] = time.time() - t0

    t0 = time.time()
    minhash_near_duplicates(docs, num_hashes=16, bands=8, threshold=0.7).count()
    timings["minhash_near_dup"] = time.time() - t0

    # north-star input path end-to-end: pages -> Arrow link extraction ->
    # canonical web graph -> PageRank
    from arkouda_njit_spark.sources import build_web_graph, generate_pages

    t0 = time.time()
    pages = generate_pages(spark, n_pages=20000, links_per_page=10, seed=42)
    wg = build_web_graph(pages)
    pagerank(wg, tol=0.0, max_iterations=5).count()
    timings["web_pipeline"] = time.time() - t0

    return timings, extras


def main():
    import statistics

    from arkouda_njit_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    runs: list[tuple[dict, dict]] = [run_queries(spark) for _ in range(REPEAT)]
    timings = {
        k: statistics.median(t[k] for t, _ in runs) for k in runs[0][0]
    }
    extras = {k: statistics.median(e[k] for _, e in runs) for k in runs[0][1]}
    total = sum(timings.values())
    result = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "pagerank_iters_per_hour": round(extras["pagerank_iters_per_hour"], 1),
        "pagerank_edges_per_sec": round(extras["pagerank_edges_per_sec"], 1),
    }
    if REPEAT > 1:
        result["repeats"] = REPEAT
        result["spread"] = {
            k: round(
                max(t[k] for t, _ in runs) - min(t[k] for t, _ in runs), 3
            )
            for k in runs[0][0]
        }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
