"""Square (4-cycle) counting — hub-safe Chiba–Nishizeki formulation.

Reference kernel: Chiba-Nishizeki-style sequential counter with a
total-degree vertex order — /root/reference/arachne/server/SquareCount.chpl:24-77
(client methods.py:224-252). The reference processes vertices in
DECREASING total-degree order, counting wedges only into not-yet-processed
(lower-ranked) vertices.

Spark formulation of the same ordering. Fix a total order ≺ by
(degree DESC, vid ASC) — "v ≺ u" means v is processed before u. Every
4-cycle has a unique first-processed vertex f; the cycle's diagonal
containing f is {f, o} and its two middles are f's cycle-neighbors, both
processed after f. Hence

    squares = Σ_{(v,w): v ≺ w}  C(c_vw, 2)

where c_vw = |{common neighbors m of v,w with v ≺ m}| — each square is
counted exactly once, at its first vertex v (the later diagonal {b,d}
contributes nothing because one of ITS middles is v itself, which is not
after b).

Scale shape: the wedge enumeration joins legs (m → v) restricted to
v ≺ m with unrestricted legs (m → w). The restricted side is the
lo→hi degree orientation's out-edges (operators/triangles.oriented_edges
bound): every middle m has ≤ O(√m_edges) processed-before neighbors, so
the per-middle fan-out is O(√m_edges · deg(m)) and the total is the
Chiba–Nishizeki O(m^1.5) — a 10⁶-degree hub no longer yields deg² wedges
(the unoriented self-join's failure mode at 100×).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import Graph
from .triangles import _undirected_simple_edges


def squares(graph: Graph) -> int:
    und = _undirected_simple_edges(graph)
    sym = und.select(F.col("u").alias("mid"), F.col("v").alias("end")).unionAll(
        und.select(F.col("v").alias("mid"), F.col("u").alias("end"))
    )
    deg = sym.groupBy("mid").agg(F.count("*").alias("d")).select(
        F.col("mid").alias("vid"), "d"
    )
    # adjacency legs with both endpoints' degrees attached
    adj = (
        sym.join(deg.select(F.col("vid").alias("mid"), F.col("d").alias("dm")), "mid")
        .join(deg.select(F.col("vid").alias("end"), F.col("d").alias("de")), "end")
        .select("mid", "end", "dm", "de")
    )

    def before(d1, v1, d2, v2):
        # (deg DESC, vid ASC) processing order — SquareCount.chpl:24-28
        return (F.col(d1) > F.col(d2)) | (
            (F.col(d1) == F.col(d2)) & (F.col(v1) < F.col(v2))
        )

    # restricted legs: endpoint v processed BEFORE the middle (this is the
    # small side — O(sqrt m) per middle under degree ordering)
    w1 = adj.filter(before("de", "end", "dm", "mid")).select(
        "mid", F.col("end").alias("a"), F.col("de").alias("da")
    )
    # unrestricted legs
    w2 = adj.select("mid", F.col("end").alias("b"), F.col("de").alias("db"))
    wedges = (
        w1.join(w2, "mid")
        .filter(before("da", "a", "db", "b"))  # v ≺ w (also excludes a==b)
        .select("a", "b")
    )
    counts = wedges.groupBy("a", "b").agg(F.count("*").alias("c"))
    total = counts.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("s")
    ).collect()[0]["s"]
    return int(total or 0)
