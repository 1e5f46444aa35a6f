"""Link-prediction scores over vertex pairs: common neighbors, Adamic-Adar,
resource allocation, preferential attachment — plus the directed web-graph
pair of co-citation and bibliographic coupling.

Reference parity: the reference ships vertex-pair Jaccard as its similarity
operator (arachne_development/server/JaccardMsg.chpl:101-278, wedge counting
into a dense JaccGamma array); the classic link-prediction family is the
same wedge computation with a different per-middle weight:

    common_neighbors(u,v)        = |N(u) ∩ N(v)|              (weight 1)
    adamic_adar(u,v)             = Σ_{m ∈ N(u)∩N(v)} 1/ln(deg m)
    resource_allocation(u,v)     = Σ_{m ∈ N(u)∩N(v)} 1/deg(m)
    preferential_attachment(u,v) = deg(u) · deg(v)

so all four (and Jaccard itself) come out of ONE wedge pass — one shuffle,
four aggregates — instead of four operators.

Scale shape (same discipline as operators/jaccard.py): the all-pairs output
is inherently Σ_m C(deg m, 2) rows, quadratic in hub degree. At web scale
you pass ``candidates`` (pairs from an LSH/banding pass or a who-to-follow
circle) and the plan becomes candidates ⋈ adjacency ⋈ adjacency. Without
candidates, hot middles (deg > ``hub_threshold``) are two-sided salted so a
10⁶-degree hub's wedge cross-product decomposes into salt² reducer cells
instead of one straggler task. The per-middle weight rides along on the
left leg (8 bytes/row), so no post-wedge degree join is needed.

Co-citation (Small 1973) and bibliographic coupling (Kessler 1963) are the
directed versions — wedge center = the citing page (cocitation: m→u, m→v)
or the cited page (coupling: u→m, v→m). On a web link graph these power
"related pages" retrieval; the center-degree salting matters even more
there (index/hub pages cite thousands of URLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .triangles import _undirected_simple_edges


def _salted_wedge_pairs(
    legs: DataFrame, hub_threshold: int, salt_buckets: int
) -> DataFrame:
    """All (a, b) wedge pairs (a < b) from ``legs`` = (mid, end, w) rows,
    carrying the left leg's per-middle weight ``w``. Middles whose leg count
    exceeds ``hub_threshold`` are two-sided salted: each leg hashes itself
    into one of S buckets and replicates across the other side's S buckets,
    so each (a, b) pair still meets exactly once — at (salt(a), salt(b)) —
    but the hub's deg² rows spread over S² cells of (deg/S)² each.
    """
    cnt = legs.groupBy("mid").agg(F.count("*").alias("_dm"))
    tagged = legs.join(cnt, "mid")
    cold = tagged.filter(F.col("_dm") <= hub_threshold)
    hot = tagged.filter(F.col("_dm") > hub_threshold)

    w1c = cold.select("mid", F.col("end").alias("a"), "w")
    w2c = cold.select("mid", F.col("end").alias("b"))
    pairs_cold = w1c.join(w2c, "mid").filter(F.col("a") < F.col("b"))

    S = salt_buckets
    salts = F.explode(F.array(*[F.lit(i) for i in range(S)]))
    w1h = hot.select(
        "mid",
        F.col("end").alias("a"),
        "w",
        F.pmod(F.xxhash64("end"), F.lit(S)).alias("_sa"),
    ).withColumn("_sb", salts)
    w2h = hot.select(
        "mid",
        F.col("end").alias("b"),
        F.pmod(F.xxhash64("end"), F.lit(S)).alias("_sb"),
    ).withColumn("_sa", salts)
    pairs_hot = (
        w1h.join(w2h, ["mid", "_sa", "_sb"])
        .filter(F.col("a") < F.col("b"))
        .select("mid", "a", "b", "w")
    )
    return pairs_cold.select("a", "b", "w").unionAll(pairs_hot.select("a", "b", "w"))


def link_prediction(
    graph: Graph,
    candidates: DataFrame | None = None,
    hub_threshold: int = 10_000,
    salt_buckets: int = 16,
) -> DataFrame:
    """(u, v, common_neighbors, jaccard, adamic_adar, resource_allocation,
    preferential_attachment) for u < v pairs with ≥1 common neighbor (or for
    the given ``candidates`` pairs, the 100 TB path).

    Matches networkx's definitions: degrees are simple-graph degrees, the
    Adamic-Adar log is natural. A common neighbor always has degree ≥ 2, so
    1/ln(deg) never divides by zero.
    """
    und = _undirected_simple_edges(graph)
    sym = und.select(F.col("u").alias("mid"), F.col("v").alias("end")).unionAll(
        und.select(F.col("v").alias("mid"), F.col("u").alias("end"))
    )
    deg = sym.groupBy("end").agg(F.count("*").alias("deg")).withColumnRenamed(
        "end", "vid"
    )
    dm = deg.select(F.col("vid").alias("mid"), F.col("deg").alias("w"))

    if candidates is not None:
        cand = candidates.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        ).distinct()
        adj_a = sym.select(F.col("end").alias("a"), "mid")
        adj_b = sym.select(F.col("end").alias("b"), "mid")
        pairs = cand.join(adj_a, "a").join(adj_b, ["b", "mid"]).join(dm, "mid")
    else:
        legs = sym.join(dm, "mid")  # w = deg(mid)
        pairs = _salted_wedge_pairs(legs, hub_threshold, salt_buckets)

    scores = pairs.groupBy("a", "b").agg(
        F.count("*").alias("cn"),
        F.sum(F.lit(1.0) / F.log("w")).alias("aa"),
        F.sum(F.lit(1.0) / F.col("w")).alias("ra"),
    )
    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("db"))
    return (
        scores.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            F.col("cn").alias("common_neighbors"),
            (F.col("cn") / (F.col("da") + F.col("db") - F.col("cn"))).alias("jaccard"),
            F.col("aa").alias("adamic_adar"),
            F.col("ra").alias("resource_allocation"),
            (F.col("da") * F.col("db")).alias("preferential_attachment"),
        )
    )


def _directed_wedges(
    edges: DataFrame, center: str, hub_threshold: int, salt_buckets: int
) -> DataFrame:
    """(u, v, n) pair counts where the wedge center is ``src`` (co-citation:
    one page links to both u and v) or ``dst`` (coupling: u and v both link
    to the same page)."""
    end = "dst" if center == "src" else "src"
    legs = (
        edges.select(F.col(center).alias("mid"), F.col(end).alias("end"))
        .filter(F.col("mid") != F.col("end"))
        .distinct()
        .withColumn("w", F.lit(1))
    )
    pairs = _salted_wedge_pairs(legs, hub_threshold, salt_buckets)
    return pairs.groupBy("a", "b").agg(F.count("*").alias("n")).select(
        F.col("a").alias("u"), F.col("b").alias("v"), "n"
    )


def cocitation(
    graph: Graph, hub_threshold: int = 10_000, salt_buckets: int = 16
) -> DataFrame:
    """(u, v, cocitations): number of pages that link to BOTH u and v
    (u < v). Directed graphs only — the web's "related pages" signal."""
    if not graph.directed:
        raise ValueError("cocitation is defined on directed graphs")
    return _directed_wedges(graph.edges, "src", hub_threshold, salt_buckets).select(
        "u", "v", F.col("n").alias("cocitations")
    )


def bibliographic_coupling(
    graph: Graph, hub_threshold: int = 10_000, salt_buckets: int = 16
) -> DataFrame:
    """(u, v, couplings): number of pages BOTH u and v link to (u < v).
    Directed graphs only."""
    if not graph.directed:
        raise ValueError("bibliographic_coupling is defined on directed graphs")
    return _directed_wedges(graph.edges, "dst", hub_threshold, salt_buckets).select(
        "u", "v", F.col("n").alias("couplings")
    )
