"""Square (4-cycle) counting.

Reference kernel: Chiba-Nishizeki-style sequential counter with a
total-degree vertex order — /root/reference/arachne/server/SquareCount.chpl:24-77
(client methods.py:224-252).

Spark formulation (combinatorial identity instead of the sequential L
counter): every 4-cycle u-v-w-x has exactly two diagonal pairs {u,w},{v,x};
for an unordered pair {a,b} with c = |N(a)∩N(b)| common neighbors there are
C(c,2) cycles having {a,b} as a diagonal. Hence

    squares = (1/2) * Σ_{a<b} C(common(a,b), 2)

computed as a wedge self-join on the middle vertex + a count aggregation.
The wedge join fans out quadratically at hub middles; we orient the wedge
enumeration by the reference's degree order (SquareCount.chpl:24-28) only in
the sense that counting is per unordered endpoint pair, which Spark
pre-aggregates map-side.
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
    w1 = sym.select("mid", F.col("end").alias("a"))
    w2 = sym.select("mid", F.col("end").alias("b"))
    wedges = w1.join(w2, "mid").filter(F.col("a") < F.col("b"))
    counts = wedges.groupBy("a", "b").agg(F.count("*").alias("c"))
    total = counts.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("s")
    ).collect()[0]["s"]
    return int(total or 0) // 2
