"""HyperBall — HyperLogLog-counter balls for the approximate neighborhood
function, effective diameter, and approximate harmonic/closeness centrality.

The reference's distance family (BFS BreadthFirstSearch.chpl:27-138,
diameter via double sweep) is exact and per-root; at 10^9-vertex web scale
the questions users actually ask — "what is the distance distribution /
effective diameter of this crawl?", "rank pages by harmonic centrality" —
cannot be answered by per-root BFS (O(V·E)). HyperBall (Boldi & Vigna,
"In-Core Computation of Geometric Centralities with HyperBall", and the
HyperANF line of work) is the published web-graph answer: give every vertex
a HyperLogLog counter of its ball B(v, t) = {u : d(v, u) <= t}, and one
relaxation round per distance

    B(v, t+1) = B(v, t)  UNION  B(u, t)   for every edge v -> u,

where the HLL union is an element-wise register max. Counters are tiny
(m one-byte registers per vertex — 64 B at the default log2m=6) and the
whole sweep is a fixed number of rounds equal to the graph's diameter.

Spark-first layout: the m registers are m *columns* of one-byte integers,
so the union-by-neighbors step is a single ``groupBy(src).agg(max(r_j)...)``
— JVM whole-stage codegen, map-side partial aggregation (a partition
combines its own hubs' contributions before anything shuffles), one
exchange per round on uniform hash keys. Per-vertex state never exceeds
m bytes + two doubles; the per-round network volume is O(E) rows of m
bytes with map-side combine down to O(distinct src per partition). No
UDF anywhere; the rho/estimator math is built-in column expressions
(xxhash64 + bin-length for the leading-zero count).

One action per round, the engine's standard discipline (scc.py:70-110):
registers only ever grow, so the global register sum is monotone and an
unchanged sum IS the fixpoint; the same aggregation job returns the
round's neighborhood-function estimate NF(t) = sum_v |B(v, t)| and doubles
as the materializing action for the round's (stats-safe) checkpoint.

Estimates are deterministic and partition-invariant: the only randomness
is xxhash64(vid, seed).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph

_MAX_ROUNDS = 1024  # > any real graph's diameter; exceeding it is an error


def _alpha(m: int) -> float:
    """Standard HLL bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _reg_cols(m: int) -> list[str]:
    return [f"_r{j}" for j in range(m)]


def _estimate_expr(m: int):
    """HLL cardinality estimate over the m register columns: the raw
    harmonic-mean estimator with the standard linear-counting correction
    for the small range (E <= 2.5m with empty registers present). The
    64-bit hash makes the large-range correction moot."""
    z = None
    zeros = None
    for c in _reg_cols(m):
        term = F.pow(F.lit(0.5), F.col(c).cast("double"))
        z = term if z is None else z + term
        is0 = F.when(F.col(c) == 0, F.lit(1)).otherwise(F.lit(0))
        zeros = is0 if zeros is None else zeros + is0
    raw = F.lit(_alpha(m) * m * m) / z
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return (
        F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear)
        .otherwise(raw)
        .alias("est")
    )


def _register_sum_expr(m: int):
    tot = None
    for c in _reg_cols(m):
        t = F.col(c).cast("long")
        tot = t if tot is None else tot + t
    return tot


@dataclass
class HyperBallResult:
    """Converged per-vertex counters plus the per-distance curve."""

    balls: DataFrame  # (vid, ball, harmonic) — label-mapped if asked
    nf: list[tuple[int, float]] = field(default_factory=list)  # (t, NF(t))
    rounds: int = 0
    wall_sec: list[float] = field(default_factory=list)

    def neighbourhood_function(self) -> list[tuple[int, float]]:
        return list(self.nf)

    def effective_diameter(self, q: float = 0.9) -> float:
        """Smallest (interpolated) t with NF(t) >= q * NF(converged)."""
        if not self.nf:
            return 0.0
        target = q * self.nf[-1][1]
        prev_t, prev_v = self.nf[0]
        if prev_v >= target:
            return float(prev_t)
        for t, v in self.nf[1:]:
            if v >= target:
                if v == prev_v:
                    return float(t)
                return prev_t + (target - prev_v) / (v - prev_v)
            prev_t, prev_v = t, v
        return float(self.nf[-1][0])


def hyperball(
    graph: Graph,
    log2m: int = 6,
    seed: int = 42,
    direction: str = "out",
    max_t: int | None = None,
) -> HyperBallResult:
    """Run HyperBall to the reachability fixpoint (or ``max_t`` rounds).

    ``direction="out"`` grows B(v) = vertices *reachable from* v, so the
    ``harmonic`` column is sum 1/d(v, u) over outgoing distances;
    ``direction="in"`` runs on the transposed edges, giving the standard
    harmonic centrality sum_{u != v} 1/d(u, v) (Boldi–Vigna run on the
    transpose for exactly this reason). On an undirected :class:`Graph`
    (symmetric edge table) the two are identical.

    Returns a :class:`HyperBallResult`: ``balls`` is one row per vertex
    ``(vid, ball, harmonic)`` with ``ball`` the estimated reachable-set
    size at convergence, and ``nf`` the per-distance neighborhood curve
    NF(t) (NF(0) = n-vertices estimate). Estimates carry the standard HLL
    relative error ~1.04/sqrt(2^log2m) (~13% at the default log2m=6;
    raise log2m for tighter bounds — state is 2^log2m bytes/vertex).
    """
    if direction not in ("out", "in"):
        raise ValueError(f"direction must be 'out' or 'in', got {direction!r}")
    if not 4 <= log2m <= 12:
        raise ValueError("log2m must be in [4, 12] (16..4096 registers)")
    m = 1 << log2m
    cols = _reg_cols(m)

    edges = graph.edges.select("src", "dst").distinct()
    if direction == "in":
        edges = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    # materialize the deduped edge view once: it is joined every round and
    # re-running its distinct exchange per round would double round cost
    edges = edges.localCheckpoint(eager=True)

    # -- init: each vertex's counter holds only itself --------------------
    h = F.xxhash64(F.col("vid"), F.lit(seed))
    idx = h.bitwiseAND(F.lit(m - 1))
    width = 64 - log2m
    w = F.shiftrightunsigned(h, log2m)
    # rho = leading zeros of the width-bit word + 1; bin() has no leading
    # zeros, so bitlen(w) = length(bin(w)) for w > 0 (exact, JVM-side —
    # no float log2 rounding risk at the 2^k boundaries)
    rho = (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(w)))
        .cast("byte")
    )
    init_regs = [
        F.when(idx == j, rho).otherwise(F.lit(0).cast("byte")).alias(c)
        for j, c in enumerate(cols)
    ]
    state = (
        graph.vertices.select("vid", *init_regs)
        .select("vid", *cols, _estimate_expr(m))
        .select("*", F.lit(0.0).alias("hc"))
        .localCheckpoint(eager=False)
    )
    agg_exprs = [
        F.sum(_register_sum_expr(m)).alias("regsum"),
        F.sum("est").alias("nf"),
    ]
    row = state.agg(*agg_exprs).collect()[0]
    prev_sum = row["regsum"]
    nf: list[tuple[int, float]] = [(0, float(row["nf"]))]
    walls: list[float] = []

    limit = max_t if max_t is not None else _MAX_ROUNDS
    t = 0
    while t < limit:
        t += 1
        t0 = time.time()
        contrib = (
            edges.join(
                state.select(F.col("vid").alias("dst"), *cols), "dst"
            )
            .groupBy(F.col("src").alias("vid"))
            .agg(*[F.max(c).alias(f"_c{j}") for j, c in enumerate(cols)])
        )
        merged = [
            F.greatest(
                F.col(c), F.coalesce(F.col(f"_c{j}"), F.lit(0).cast("byte"))
            ).alias(c)
            for j, c in enumerate(cols)
        ]
        nxt = (
            state.join(contrib, "vid", "left")
            .select("vid", *merged, F.col("est").alias("_pe"), "hc")
            .select("vid", *cols, _estimate_expr(m), "_pe", "hc")
            .select(
                "vid",
                *cols,
                "est",
                # harmonic increment: newly reached mass at distance t.
                # Registers are monotone but the estimator can dip a hair
                # when it crosses the linear-counting boundary — clamp.
                (
                    F.col("hc")
                    + F.greatest(F.col("est") - F.col("_pe"), F.lit(0.0))
                    / F.lit(float(t))
                ).alias("hc"),
            )
            .localCheckpoint(eager=False)
        )
        row = nxt.agg(*agg_exprs).collect()[0]
        walls.append(time.time() - t0)
        state.unpersist()  # nxt is materialized; drop the old generation
        state = nxt
        if row["regsum"] == prev_sum:
            nf.append((t, nf[-1][1]))  # curve is flat at the fixpoint
            break
        prev_sum = row["regsum"]
        nf.append((t, float(row["nf"])))
    else:
        if max_t is None:
            raise RuntimeError(
                f"hyperball did not converge within {_MAX_ROUNDS} rounds; "
                "the graph's diameter exceeds the guard — raise max_t "
                "explicitly to run a truncated sweep"
            )

    edges.unpersist()
    balls = state.select(
        "vid", F.col("est").alias("ball"), F.col("hc").alias("harmonic")
    )
    return HyperBallResult(balls=balls, nf=nf, rounds=t, wall_sec=walls)


def neighbourhood_function(
    graph: Graph, log2m: int = 6, seed: int = 42, max_t: int | None = None
) -> list[tuple[int, float]]:
    """NF(t) = estimated number of pairs (v, u) with d(v, u) <= t, per t."""
    return hyperball(graph, log2m=log2m, seed=seed, max_t=max_t).nf


def effective_diameter(
    graph: Graph, q: float = 0.9, log2m: int = 6, seed: int = 42
) -> float:
    """Interpolated smallest t such that NF(t) >= q * NF(infinity)."""
    return hyperball(graph, log2m=log2m, seed=seed).effective_diameter(q)
