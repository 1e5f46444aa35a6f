"""Uniform random walks over the graph — the DeepWalk/node2vec corpus
generator: the standard way a 100 TB link graph is turned into training
sequences for embedding models.

Determinism without ``rand()``: Spark's ``rand(seed)`` is per-partition
seeded and NOT partition-layout invariant, so the neighbor choice at step
t of walk w is instead ``argmin over neighbors d of xxhash64(w, t, d,
seed)`` — a uniform draw that is a pure function of (walk, step,
candidate), reproducible across runs, partitionings and cluster sizes.

Scale shape: one inner join (frontier × out-edges, hash-keyed by the
current vertex) plus one ``min_by`` aggregation per step — L steps for
length-L walks, frontier checkpointed per step. Output volume is
O(walks × length); the corpus writer streams it straight to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph


def random_walks(
    graph: Graph,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    seed: int = 42,
) -> DataFrame:
    """(walk_id, start, path) — ``path`` is an ``array<long>`` of vids
    beginning at ``start``; a walk that hits a vertex with no out-edge
    stops early (its path is shorter than ``walk_length + 1``). Every
    vertex starts ``walks_per_vertex`` walks."""
    if walk_length < 0 or walks_per_vertex < 1:
        raise ValueError("walk_length >= 0 and walks_per_vertex >= 1 required")
    k = walks_per_vertex
    state = (
        graph.vertices.select("vid")
        .crossJoin(F.broadcast(graph.spark.range(k).select(F.col("id").alias("rep"))))
        .select(
            (F.col("vid") * k + F.col("rep")).alias("walk_id"),
            F.col("vid").alias("start"),
            F.col("vid").alias("cur"),
            F.array(F.col("vid")).alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    finished = None
    edges = graph.edges.select("src", "dst").persist()
    for t in range(1, walk_length + 1):
        # the candidate fan-out (frontier × out-degree) carries ONLY
        # (walk_id, dst) — the growing path array joins back afterwards by
        # walk_id, so per-step shuffle volume is O(candidates) 16-byte
        # rows, not O(candidates × path length)
        choice = (
            edges.join(
                state.select("walk_id", F.col("cur").alias("src")), "src"
            )
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    F.col("dst"), F.xxhash64("walk_id", F.lit(t), "dst", F.lit(seed))
                ).alias("nxt")
            )
        )
        hop = (
            state.join(choice, "walk_id")
            .select(
                "walk_id",
                "start",
                F.col("nxt").alias("cur"),
                F.array_append("path", F.col("nxt")).alias("path"),
            )
            .localCheckpoint(eager=False)
        )
        # the step's ONE action: the count materializes the lazy checkpoint
        # AND doubles as the emptiness test (no isEmpty probe — same shape
        # as bfs.py's one-job-per-level loop, round-4 verdict #4)
        n_alive = hop.count()
        # walks whose current vertex had no out-edge stop here
        stopped = state.join(hop.select("walk_id"), "walk_id", "left_anti").select(
            "walk_id", "start", "path"
        )
        finished = stopped if finished is None else finished.unionAll(stopped)
        state = hop
        if n_alive == 0:
            break
    tail = state.select("walk_id", "start", "path")
    out = tail if finished is None else finished.unionAll(tail)
    result = out.localCheckpoint(eager=True)
    edges.unpersist()
    return result


def walk_corpus(
    graph: Graph,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    seed: int = 42,
) -> DataFrame:
    """The walks as a text corpus: (walk_id, sentence) with the original
    vertex LABELS space-joined — the exact input shape a skip-gram
    trainer consumes."""
    walks = random_walks(graph, walk_length, walks_per_vertex, seed)
    label_of = graph.vertices.select("vid", "label")
    exploded = walks.select(
        "walk_id", F.posexplode("path").alias("pos", "vid")
    ).join(label_of, "vid")
    return (
        exploded.groupBy("walk_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos"),
                                F.col("label").cast("string").alias("lbl"),
                            )
                        )
                    ),
                    lambda s: s["lbl"],
                ),
            ).alias("sentence")
        )
    )


def node2vec_walks(
    graph: Graph,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """node2vec second-order biased walks: from edge (prev → cur), the
    next vertex d is weighted 1/p if d == prev (return), 1 if d is a
    neighbor of prev (BFS-like), 1/q otherwise (DFS-like). p == q == 1
    degenerates to :func:`random_walks`.

    Deterministic weighted choice without ``rand()``: exponential-race
    sampling — draw u(d) = hash-uniform(walk, step, d), pick
    argmin -ln(u)/w(d) (the weighted reservoir trick; each candidate's
    winning probability is w(d)/Σw). The d==prev / neighbor-of-prev test
    is one left join against the edge set keyed (prev, dst) — no
    adjacency broadcast, no driver state."""
    if walk_length < 0 or walks_per_vertex < 1:
        raise ValueError("walk_length >= 0 and walks_per_vertex >= 1 required")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    k = walks_per_vertex
    edges = graph.edges.select("src", "dst").distinct().persist()
    prev_edges = edges.select(
        F.col("src").alias("prev"), F.col("dst").alias("cand"), F.lit(True).alias("_nb")
    )
    state = (
        graph.vertices.select("vid")
        .crossJoin(F.broadcast(graph.spark.range(k).select(F.col("id").alias("rep"))))
        .select(
            (F.col("vid") * k + F.col("rep")).alias("walk_id"),
            F.col("vid").alias("start"),
            F.lit(None).cast("long").alias("prev"),
            F.col("vid").alias("cur"),
            F.array(F.col("vid")).alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    finished = None
    # u in (0, 1]: (|hash| + 1) / (2^63 + 1) — never 0, so ln(u) is finite
    two63 = float(2**63)
    for t in range(1, walk_length + 1):
        # fan-out rows carry only (walk_id, prev, cand) — the bias needs
        # prev, but start/path join back by walk_id after the choice
        cand = edges.join(
            state.select("walk_id", "prev", F.col("cur").alias("src")), "src"
        ).select("walk_id", "prev", F.col("dst").alias("cand"))
        cand = cand.join(prev_edges, ["prev", "cand"], "left")
        w = (
            F.when(F.col("cand") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("_nb"), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        u = (
            F.abs(F.xxhash64("walk_id", F.lit(t), "cand", F.lit(seed))).cast("double")
            + 1.0
        ) / F.lit(two63 + 1.0)
        score = -F.log(u) / w
        choice = cand.groupBy("walk_id").agg(F.min_by(F.col("cand"), score).alias("nxt"))
        hop = (
            state.join(choice, "walk_id")
            .select(
                "walk_id", "start",
                F.col("cur").alias("prev"),
                F.col("nxt").alias("cur"),
                F.array_append("path", F.col("nxt")).alias("path"),
            )
            .localCheckpoint(eager=False)
        )
        # one action per step: count materializes the checkpoint and tests
        # emptiness (round-4 verdict #4)
        n_alive = hop.count()
        stopped = state.join(hop.select("walk_id"), "walk_id", "left_anti").select(
            "walk_id", "start", "path"
        )
        finished = stopped if finished is None else finished.unionAll(stopped)
        state = hop
        if n_alive == 0:
            break
    tail = state.select("walk_id", "start", "path")
    out = tail if finished is None else finished.unionAll(tail)
    result = out.localCheckpoint(eager=True)
    edges.unpersist()
    return result
