"""GraphCatalog: named registration, SQL views, save/load round-trip."""

from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.catalog import GraphCatalog

from fixtures import CC17_DST, CC17_SRC


def test_catalog_register_and_sql(spark):
    cat = GraphCatalog(spark)
    g = Graph.from_edges(spark, CC17_SRC, CC17_DST)
    cat.register("cc17", g)
    assert "cc17" in cat and cat.list() == ["cc17"]
    # the temp views answer SQL — the reference's symbol-table access path
    n = spark.sql("SELECT COUNT(*) AS n FROM cc17_vertices").collect()[0]["n"]
    assert n == g.n_vertices
    deg = spark.sql(
        "SELECT src, COUNT(*) AS d FROM cc17_edges GROUP BY src ORDER BY d DESC LIMIT 1"
    ).collect()[0]
    assert deg["d"] >= 1


def test_catalog_save_load(spark, tmp_path):
    cat = GraphCatalog(spark)
    g = Graph.from_edges(spark, CC17_SRC, CC17_DST)
    cat.register("g1", g)
    cat.save("g1", str(tmp_path / "g1"))
    g2 = cat.load("g1_back", str(tmp_path / "g1"))
    assert g2.n_vertices == g.n_vertices
    assert g2.n_edges == g.n_edges
    assert sorted(map(tuple, g2.edges.select("src", "dst").collect())) == sorted(
        map(tuple, g.edges.select("src", "dst").collect())
    )
    cat.drop("g1_back")
    assert "g1_back" not in cat


def test_catalog_digraph_roundtrip(spark, tmp_path):
    """save/load preserves directedness: a DiGraph must not come back as
    an undirected Graph with halved edge count (review finding)."""
    from arkouda_njit_spark import DiGraph
    from arkouda_njit_spark.catalog import GraphCatalog

    cat = GraphCatalog(spark)
    dg = DiGraph.from_edges(spark, [1, 2, 3, 4], [2, 3, 1, 1])
    cat.register("d", dg)
    p = str(tmp_path / "dsave")
    cat.save("d", p)
    g2 = cat.load("d2", p)
    assert type(g2) is DiGraph and g2.directed
    assert g2.n_edges == dg.n_edges == 4
