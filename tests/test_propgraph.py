"""PropGraph attribute loading, filter_edges, subgraph_view —
propgraphclass.py / prop_graph_test.py parity on the propgraph18 fixture."""

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.propgraph import PropGraph

# propgraph18 — algorithm_test.py:157-192
SRC = [1, 1, 2, 2, 3, 0, 3, 3, 4, 4, 4, 5, 5, 7, 7, 8, 8, 9]
DST = [3, 0, 1, 4, 0, 3, 4, 7, 1, 5, 8, 2, 9, 4, 6, 5, 7, 8]


@pytest.fixture(scope="module")
def pg(spark):
    edge_df = spark.createDataFrame(
        [(s, d, "rel1" if s % 2 == 0 else "rel2", float(i)) for i, (s, d) in enumerate(zip(SRC, DST))],
        "from_v long, to_v long, rels1 string, score double",
    )
    g = PropGraph.from_edge_attributes(
        edge_df, "from_v", "to_v", relationship_columns=["rels1"]
    )
    node_df = spark.createDataFrame(
        [(i, "lbl1" if i < 5 else "lbl2", i * 10) for i in range(10)],
        "nodes long, lbls1 string, rank int",
    )
    g.load_node_attributes(node_df, "nodes", label_columns=["lbls1"])
    return g


def test_build(pg):
    assert pg.n_vertices == 10
    assert pg.n_edges == 18  # no dups, no self loops in fixture
    assert pg.edge_attributes.count() == 18
    assert set(pg.get_node_labels().columns) == {"nodes", "lbls1"}


def test_filter_edges(pg):
    got = sorted(map(tuple, pg.filter_edges({"lbls1": "lbl1"}, {"rels1": "rel1"}).collect()))
    # manual oracle: edges with src even (rel1) and both endpoints < 5 (lbl1)
    expected = sorted(
        (s, d)
        for s, d in zip(SRC, DST)
        if s % 2 == 0 and s < 5 and d < 5
    )
    assert got == expected


def test_subgraph_view_node_only(pg):
    # node filter only: edges with EITHER endpoint kept (reference quirk)
    sub = pg.subgraph_view(filter_node=F.col("lbls1") == "lbl1")
    kept = {(s, d) for s, d in zip(SRC, DST) if s < 5 or d < 5}
    assert sub.n_edges == len(kept)


def test_subgraph_view_node_and_edge(pg):
    sub = pg.subgraph_view(
        filter_node=F.col("rank") <= 70,
        filter_edge=lambda df: df["score"] < 10.0,
    )
    kept = {
        (s, d)
        for i, (s, d) in enumerate(zip(SRC, DST))
        if i < 10 and s <= 7 and d <= 7
    }
    assert sub.n_edges == len(kept)
    got_edges = {
        (r["src_label"], r["dst_label"]) for r in sub.edge_list().collect()
    }
    assert got_edges == kept


def test_dedup_first_attribute_row(spark):
    df = spark.createDataFrame(
        [(1, 2, "a"), (1, 2, "b"), (2, 2, "self")],
        "src long, dst long, tag string",
    )
    g = PropGraph.from_edge_attributes(df, "src", "dst")
    rows = g.edge_attributes.collect()
    assert len(rows) == 1  # self-loop dropped, duplicate collapsed
    assert rows[0]["tag"] in ("a", "b")


def test_subgraph_view_without_node_attributes(spark):
    """Edge-only filter on a PropGraph with NO node attributes: the node
    universe is the graph's vertex set (reference uses self.nodes()),
    not a crash (review finding)."""
    edges = spark.createDataFrame(
        [(1, 2, "a"), (2, 3, "b"), (3, 1, "a")], "src long, dst long, tag string"
    )
    pg = PropGraph.from_edge_attributes(edges, "src", "dst", ["tag"])
    sub = pg.subgraph_view(filter_edge=F.col("tag") == "a")
    got = {(r["src_label"], r["dst_label"]) for r in sub.edge_list().collect()}
    assert got == {(1, 2), (3, 1)}


def test_add_edge_relationships_dedups(spark):
    edges = spark.createDataFrame(
        [(1, 2, "x"), (2, 3, "x"), (3, 1, "x")], "src long, dst long, tag string"
    )
    pg = PropGraph.from_edge_attributes(edges, "src", "dst", ["tag"])
    rels = spark.createDataFrame(
        [(1, 2, "r1"), (1, 2, "r2"), (2, 2, "loop")], "s long, d long, rel string"
    )
    pg.add_edge_relationships(rels, "s", "d")
    # one row per edge preserved: dup collapsed deterministically, loop dropped
    assert pg.edge_attributes.count() == 3
    row = pg.edge_attributes.filter((F.col("src") == 1) & (F.col("dst") == 2)).collect()
    assert len(row) == 1 and row[0]["rel"] == "r1"  # min-of-group


def test_add_node_labels_dedups_and_rejects_collisions(spark):
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(1, 2, "x"), (2, 3, "x")], "src long, dst long, tag string"
    )
    pg = PropGraph.from_edge_attributes(edges, "src", "dst", ["tag"])
    pg.load_node_attributes(
        spark.createDataFrame([(1, "p"), (2, "q"), (3, "p")], "n long, kind string"),
        "n",
        ["kind"],
    )
    labels = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A")], "n long, grp string"
    )
    pg.add_node_labels(labels, "n")
    assert pg.node_attributes.count() == 3  # still one row per node
    assert pg.node_attributes.filter(F.col("nodes") == 1).collect()[0]["grp"] == "A"
    with _pytest.raises(ValueError, match="already present"):
        pg.add_node_labels(
            spark.createDataFrame([(1, "z")], "n long, kind string"), "n"
        )
