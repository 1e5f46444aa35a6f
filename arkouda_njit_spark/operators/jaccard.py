"""Vertex-pair Jaccard similarity (dev-tree operator).

Reference: /root/reference/arachne_development/server/JaccardMsg.chpl:101-278
computes, for vertex pairs, |N(u)∩N(v)| / (deg(u) + deg(v) − |N(u)∩N(v)|)
via wedge counting into a dense JaccGamma array.

Spark formulation: common-neighbor counts from a wedge self-join on the
middle vertex (only pairs with ≥1 common neighbor have a non-zero Jaccard,
so the output is the sparse set the dense array wastes space on), degrees
from one aggregation, everything map-side combined.

Scale shape (north rule / power-law hubs): the all-pairs output is
inherently Σ_m C(deg(m), 2) rows — at web scale you pass ``candidates``
(the pairs you actually want scored, e.g. from an LSH banding pass, the
same pattern as functions/dedup.ngram_jaccard_pairs) and the plan becomes
a candidates ⋈ adjacency ⋈ adjacency count with fan-out Σ_cand deg(u).
Without candidates, the wedge self-join is still computed, but middles
whose degree exceeds ``hub_threshold`` are two-sided salted: the hot
middle's leg pairs are spread over ``salt_buckets²`` reducer cells instead
of one straggler task (a 10⁶-degree hub's 10¹² wedge rows never pass
through a single key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .triangles import _undirected_simple_edges


def jaccard_coefficients(
    graph: Graph,
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
    hub_threshold: int = 10_000,
    salt_buckets: int = 16,
) -> DataFrame:
    """(u, v, jaccard) for u<v pairs with at least one common neighbor.

    ``candidates``: optional (u, v) pairs to score — the 100 TB path; all
    other pairs are skipped and the wedge self-join is avoided entirely.
    """
    und = _undirected_simple_edges(graph)
    sym = und.select(F.col("u").alias("mid"), F.col("v").alias("end")).unionAll(
        und.select(F.col("v").alias("mid"), F.col("u").alias("end"))
    )
    deg = sym.groupBy("end").agg(F.count("*").alias("deg")).withColumnRenamed("end", "vid")

    if candidates is not None:
        # canonicalize u<v, then count shared middles per requested pair
        cand = candidates.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        ).distinct()
        adj_a = sym.select(F.col("end").alias("a"), "mid")
        adj_b = sym.select(F.col("end").alias("b"), "mid")
        common = (
            cand.join(adj_a, "a")
            .join(adj_b, ["b", "mid"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )
    else:
        dm = deg.select(F.col("vid").alias("mid"), F.col("deg").alias("dm"))
        legs = sym.join(dm, "mid")
        cold = legs.filter(F.col("dm") <= hub_threshold).select("mid", "end")
        hot = legs.filter(F.col("dm") > hub_threshold).select("mid", "end")

        w1c = cold.select("mid", F.col("end").alias("a"))
        w2c = cold.select("mid", F.col("end").alias("b"))
        wedges_cold = w1c.join(w2c, "mid").filter(F.col("a") < F.col("b"))

        # hot middles: TWO-sided salt — each leg carries its own hash
        # bucket and is replicated across the other side's buckets, so the
        # hub's cross product decomposes into S² cells of (deg/S)² rows
        # each (one-sided salting would still push deg²/S rows through
        # every single cell). Each (a, b) pair meets exactly once, at
        # (salt(a), salt(b)).
        S = salt_buckets
        salts = F.explode(F.array(*[F.lit(i) for i in range(S)]))
        w1h = hot.select(
            "mid",
            F.col("end").alias("a"),
            F.pmod(F.xxhash64("end"), F.lit(S)).alias("_sa"),
        ).withColumn("_sb", salts)
        w2h = hot.select(
            "mid",
            F.col("end").alias("b"),
            F.pmod(F.xxhash64("end"), F.lit(S)).alias("_sb"),
        ).withColumn("_sa", salts)
        wedges_hot = (
            w1h.join(w2h, ["mid", "_sa", "_sb"]).filter(F.col("a") < F.col("b"))
            .select("mid", "a", "b")
        )
        common = (
            wedges_cold.select("a", "b")
            .unionAll(wedges_hot.select("a", "b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("common"))
        )

    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("db"))
    out = (
        common.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            (
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out
