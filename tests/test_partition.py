"""Balanced LDG-restreaming partitioner: cut improvement, the capacity
invariant, and partitioning-determinism."""

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import balanced_partition, edge_cut


def _two_cliques(spark, k=6, bridges=1):
    """Two K_k cliques joined by ``bridges`` edges."""
    edges = []
    for base in (0, 100):
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base + i, base + j))
    for b in range(bridges):
        edges.append((b, 100 + b))
    return Graph.from_edges(
        spark, [u for u, _ in edges], [v for _, v in edges]
    )


def _loads(assign):
    return {
        r["block"]: r["n"]
        for r in assign.groupBy("block").agg(F.count("*").alias("n")).collect()
    }


def test_two_cliques_separate(spark):
    g = _two_cliques(spark)
    assign = balanced_partition(g, num_blocks=2, slack=1.2)
    init = g.vertices.select(
        "vid", F.pmod(F.col("vid"), F.lit(2)).cast("int").alias("block")
    )
    cut0 = edge_cut(g, init, col="block")
    cut1 = edge_cut(g, assign, col="block")
    assert cut1 < cut0
    # the optimum separates the cliques: only the bridge is cut
    assert cut1 == 1.0
    # each clique ended up monochromatic
    lbl = {r["vid"]: r["label"] for r in g.vertices.collect()}
    blocks = {r["vid"]: r["block"] for r in assign.collect()}
    by_clique = {0: set(), 100: set()}
    for vid, label in lbl.items():
        by_clique[100 if label >= 100 else 0].add(blocks[vid])
    assert len(by_clique[0]) == 1 and len(by_clique[100]) == 1
    assert by_clique[0] != by_clique[100]


def test_capacity_invariant_under_attraction(spark):
    # a clique of 12 plus 4 isolated-ish pendant pairs: everyone in the
    # clique wants the same block, but cap = ceil(1.05*20/2) = 11 < 12
    edges = [(i, j) for i in range(12) for j in range(i + 1, 12)]
    edges += [(100 + 2 * p, 101 + 2 * p) for p in range(4)]
    g = Graph.from_edges(spark, [u for u, _ in edges], [v for _, v in edges])
    assign = balanced_partition(g, num_blocks=2, slack=1.05)
    cap = -(-int(1.05 * g.n_vertices) // 2)
    assert assign.count() == g.n_vertices
    assert max(_loads(assign).values()) <= cap


def test_deterministic_across_input_partitioning(spark):
    g1 = _two_cliques(spark, k=5, bridges=2)
    edges = g1.edges.select("src", "dst")
    g2 = Graph.from_edges(
        spark,
        edges.repartition(13).withColumn("weight", F.lit(1.0)),
        num_partitions=13,
    )
    a1 = sorted(map(tuple, balanced_partition(g1, 2).collect()))
    a2 = sorted(map(tuple, balanced_partition(g2, 2).collect()))
    assert a1 == a2


def test_validation(spark):
    g = _two_cliques(spark, k=3)
    with pytest.raises(ValueError):
        balanced_partition(g, num_blocks=0)
    with pytest.raises(ValueError):
        balanced_partition(g, num_blocks=2, slack=0.9)


def test_slack_one_freezes_initial_assignment(spark):
    g = _two_cliques(spark, k=4)
    assign = balanced_partition(g, num_blocks=2, slack=1.0, max_passes=2)
    want = {
        r["vid"]: r["vid"] % 2 for r in g.vertices.select("vid").collect()
    }
    got = {r["vid"]: r["block"] for r in assign.collect()}
    assert got == want


def test_host_prior_init_drains_overfull_blocks(spark):
    # four disjoint "host" cliques sized 12/6/6/4; a host-hash-style init
    # overloads block 0 (18 > cap 15). Refinement must drain block 0 to
    # within cap even though the draining vertices have NO neighbors in
    # the other block (the fallback candidate path).
    sizes = {0: 12, 100: 6, 200: 6, 300: 4}
    edges = []
    for base, k in sizes.items():
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base + i, base + j))
    g = Graph.from_edges(spark, [u for u, _ in edges], [v for _, v in edges])
    lbl2vid = {r["label"]: r["vid"] for r in g.vertices.collect()}
    init_rows = []
    for base, k in sizes.items():
        block = 0 if base in (0, 100) else 1
        for i in range(k):
            init_rows.append((lbl2vid[base + i], block))
    init = spark.createDataFrame(init_rows, "vid long, block int")
    assign = balanced_partition(
        g, num_blocks=2, slack=1.05, max_passes=12, init=init
    )
    cap = -(-int(1.05 * g.n_vertices) // 2)
    loads = _loads(assign)
    assert sum(loads.values()) == g.n_vertices
    assert max(loads.values()) <= cap
    # locality of the prior mostly survives: cut far below the
    # scatter-everything hash default's starting point
    cut = edge_cut(g, assign, col="block")
    init_hash = g.vertices.select(
        "vid", F.pmod(F.col("vid"), F.lit(2)).cast("int").alias("block")
    )
    assert cut < edge_cut(g, init_hash, col="block") / 2


def test_init_validation_raises(spark):
    g = _two_cliques(spark, k=3)
    # out-of-range block
    bad = g.vertices.select("vid", F.lit(7).alias("block"))
    with pytest.raises(ValueError, match="outside"):
        balanced_partition(g, num_blocks=2, init=bad)
    # missing vertices
    partial = g.vertices.limit(2).select(
        "vid", F.lit(0).alias("block")
    )
    with pytest.raises(ValueError, match="missing"):
        balanced_partition(g, num_blocks=2, init=partial)


def test_overfull_block_of_isolated_vertices_drains(spark):
    # 10 isolated pairs; init packs ALL vertices into block 0 of 2.
    # Members have no neighbors outside their pair, so draining relies
    # on the overfull-escape gate + lightest-block fallback.
    edges = [(2 * i, 2 * i + 1) for i in range(10)]
    g = Graph.from_edges(spark, [u for u, _ in edges], [v for _, v in edges])
    init = g.vertices.select("vid", F.lit(0).alias("block"))
    assign = balanced_partition(
        g, num_blocks=2, slack=1.1, max_passes=12, init=init
    )
    cap = -(-int(1.1 * g.n_vertices) // 2)
    loads = _loads(assign)
    assert sum(loads.values()) == g.n_vertices
    assert max(loads.values()) <= cap


def test_write_bucketed_with_assignment_layout(spark, tmp_path):
    """balanced_partition output consumed as a physical layout:
    directory-partitioned by block, bucket-by-src reuse preserved."""
    import contextlib
    import io

    g = _two_cliques(spark, k=5)
    assign = balanced_partition(g, num_blocks=2, max_passes=8, slack=1.2)
    g.write_bucketed("ldg_layout", assignment=assign)
    try:
        t = spark.table("ldg_layout_edges")
        # per-block edge rows match the assignment's src-block mapping
        blocks = {r["vid"]: r["block"] for r in assign.collect()}
        want = {}
        for r in g.edges.select("src").collect():
            b = blocks[r["src"]]
            want[b] = want.get(b, 0) + 1
        got = {
            r["_block"]: r["count"]
            for r in t.groupBy("_block").count().collect()
        }
        assert got == want
        # partition pruning: a block filter reads one directory partition
        pruned = t.filter(F.col("_block") == 0)
        assert pruned.count() == want.get(0, 0)
        # the reloaded graph drops the layout column and still answers a
        # src-keyed aggregation without exchange
        from arkouda_njit_spark import Graph as G

        g2 = G.from_table(spark, "ldg_layout")
        assert "_block" not in g2.edges.columns
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            g2.edges.groupBy("src").count().explain()
        assert "Exchange" not in buf.getvalue()
    finally:
        spark.sql("DROP TABLE IF EXISTS ldg_layout_edges")
        spark.sql("DROP TABLE IF EXISTS ldg_layout_vertices")
