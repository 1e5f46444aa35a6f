"""Subgraph isomorphism / monomorphism over (property) digraphs.

Reference: /root/reference/arachne/server/SubgraphSearch.chpl — parallel
VF2 state search (``runSearch`` 1006-1105, feasibility rules 1307-1475,
attribute matching ``doAttributesMatch`` 117-210, structural candidate
reordering 496-767); client API methods.py:427-612. The reference's
semantics match ``networkx.DiGraphMatcher.subgraph_isomorphisms_iter``
(induced) — its own test asserts that equality (algorithm_test.py:154-270).

Spark-first design — a backtracking engine is not a dataflow, so instead
the search is a **vertex-at-a-time candidate join** (the worst-case-
optimal-join shape SURVEY.md §2.5 prescribes):

  * pattern vertices are ordered connectivity-first (every next vertex is
    adjacent to an already-bound one when possible — the moral of the
    reference's structural reorder);
  * the state is a DataFrame of partial embeddings, one column per bound
    pattern vertex; binding vertex i is an equi-join of the state with the
    (attribute-pre-filtered) edge table on one anchor constraint, followed
    by semi-joins for the remaining pattern edges into the bound set,
    injectivity filters, and — for *induced* isomorphism — anti-joins for
    every pattern NON-edge into the bound set;
  * attribute matching = pre-filtering the candidate vertex/edge tables
    once, before the joins (vectorized, never per-row Python).

Each level is localCheckpoint'ed: memory stays bounded by the number of
partial embeddings, and the join fan-out is Catalyst's to schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DiGraph

# join-dispatch crossover for the per-level EXTENSION join: a filtered edge
# table at or below this many rows is broadcast (hash relation build is cheap
# and parallelism-agnostic); above it, shuffle_hash builds per-partition maps
# in parallel. The extension join's output is the level's candidate fan-out,
# so its shuffle volume is bounded by |state| + |edges| — safe either way.
SUBGRAPH_BROADCAST_ROWS = 100_000

# dispatch ceiling for SEMI/ANTI constraint joins: these run over the
# extension's wedge fan-out (|state| x avg-degree rows — orders of magnitude
# larger than either input), so a shuffle join MATERIALIZES the fan-out to
# shuffle files while a broadcast build keeps it streaming inside the
# extension's stage (probe-and-drop in whole-stage codegen, never written).
# The build side is the (pi,pj)-degree-filtered edge table, not the fan-out,
# so broadcasting it is safe up to this row count (two longs per row: a
# 20M-row hash relation is a few hundred MB, inside a normal executor's
# broadcast budget); past it — the true web-scale regime — shuffle_hash is
# the only executable shape and the fan-out materialization is the honest
# cost of a binary-join plan (measured on RMAT-19: 920 s shuffled vs 293 s
# pipelined at 2 threads; see BASELINE.md round-4 table).
SUBGRAPH_SEMI_BROADCAST_ROWS = 20_000_000


def _pattern_order(
    k: int,
    pedges: list[tuple[int, int]],
    candidate_counts: dict[int, int] | None = None,
) -> list[int]:
    """Connectivity-first ordering (structural reorder,
    SubgraphSearch.chpl:496-767). With ``candidate_counts`` (host-graph
    admissible-vertex counts per pattern vertex), the selection key becomes
    rarest-candidates-first — the probability reorder
    (generateProbabilityDistribution, SubgraphSearch.chpl:229-332: rarer
    attribute values ⇒ lower appearance probability ⇒ bind earliest)."""
    adj: dict[int, set[int]] = {v: set() for v in range(k)}
    for a, b in pedges:
        adj[a].add(b)
        adj[b].add(a)
    order: list[int] = []
    remaining = set(range(k))
    while remaining:
        connected = [v for v in remaining if any(u in order for u in adj[v])]
        pool = connected or list(remaining)
        if candidate_counts is not None:
            nxt = min(pool, key=lambda v: (candidate_counts.get(v, 0), -len(adj[v]), v))
        else:
            nxt = max(pool, key=lambda v: (len(adj[v]), -v))
        order.append(nxt)
        remaining.remove(nxt)
    return order


def subgraph_search(
    graph: DiGraph,
    pattern_edges: list[tuple[int, int]],
    pattern_vertices: list[int] | None = None,
    induced: bool = True,
    node_filter: DataFrame | None = None,
    edge_filter: DataFrame | None = None,
    size_limit: int | None = None,
    time_limit: float | None = None,
    reorder_type: str = "structural",
) -> DataFrame:
    """All embeddings of the pattern in ``graph``.

    Returns a DataFrame with columns g0..g{k-1}: g_i = the graph vid bound
    to pattern vertex i. ``induced=True`` → isomorphism (pattern non-edges
    must be absent); ``False`` → monomorphism.

    ``node_filter``: optional (vid, pv) pairs restricting which graph
    vertices may bind each pattern vertex (the attribute-match
    pre-filter); ``edge_filter``: optional (src, dst, psrc, pdst)
    restricting which graph edges may realize each pattern edge.

    ``size_limit`` caps the returned embeddings (methods.py:446-453: the
    reference returns *at least* size_limit when more exist; here exactly
    min(size_limit, total)). ``time_limit`` (minutes, methods.py:454-455)
    aborts the level loop; a level-synchronous engine has no complete
    embeddings mid-search, so a timeout returns the empty set with the
    full schema. ``reorder_type``: "structural" (connectivity-first) or
    "probability" (rarest host-candidate count first,
    SubgraphSearch.chpl:229-332).
    """
    import time as _time

    t_start = _time.monotonic()
    spark = graph.spark
    pverts = pattern_vertices or sorted({v for e in pattern_edges for v in e})
    k = len(pverts)
    vidx = {v: i for i, v in enumerate(pverts)}
    pedges = [(vidx[a], vidx[b]) for a, b in pattern_edges if a != b]
    pedge_set = set(pedges)

    E = graph.edges.select("src", "dst").persist()

    # Degree-based candidate pruning (the reference's vertex validator,
    # SubgraphSearch.chpl:1106-1118 + feasibility rules 1307-1475): a graph
    # vertex can only bind pattern vertex i if its out/in degrees dominate
    # the pattern vertex's. Sound because injectivity forces the pattern
    # edges at a vertex onto DISTINCT graph neighbors.
    p_out = {i: 0 for i in range(k)}
    p_in = {i: 0 for i in range(k)}
    for a, b in pedges:
        p_out[a] += 1
        p_in[b] += 1
    g_out = E.groupBy("src").count().select(
        F.col("src").alias("vid"), F.col("count").alias("_od")
    )
    g_in = E.groupBy("dst").count().select(
        F.col("dst").alias("vid"), F.col("count").alias("_id")
    )
    degs = (
        graph.vertices.select("vid")
        .join(g_out, "vid", "left")
        .join(g_in, "vid", "left")
        .select(
            "vid",
            F.coalesce("_od", F.lit(0)).alias("_od"),
            F.coalesce("_id", F.lit(0)).alias("_id"),
        )
        .persist()
    )

    # ONE degree-augmented edge table, cached: every per-level edge table
    # is then a pure FILTER over this cache (the degree feasibility bounds
    # reach the in-memory scan — no join per level). Join dispatch is then
    # ROLE-aware, not table-size-flat: the extension join (output = the
    # level's fan-out; shuffle volume bounded by its inputs) follows the
    # measured filtered-table size, while semi/anti constraint joins
    # (probe side = the fan-out, orders of magnitude bigger than either
    # input) broadcast their build side up to a much higher ceiling so the
    # fan-out streams through them inside one codegen stage instead of
    # being materialized to shuffle files (RMAT-19 A/B in BASELINE.md:
    # 920 s all-shuffled vs 293 s all-broadcast at 2 threads; the hybrid
    # keeps the pipelining AND the parallel extension build).
    src_degs = degs.select(
        F.col("vid").alias("src"),
        F.col("_od").alias("_s_od"),
        F.col("_id").alias("_s_id"),
    )
    dst_degs = degs.select(
        F.col("vid").alias("dst"),
        F.col("_od").alias("_d_od"),
        F.col("_id").alias("_d_id"),
    )
    base_edges = E if edge_filter is None else edge_filter
    edeg = base_edges.join(src_degs, "src").join(dst_degs, "dst").persist()

    _pair_rows: dict[tuple, int] = {}

    def edge_table(pi: int, pj: int) -> DataFrame:
        cond = (
            (F.col("_s_od") >= p_out[pi])
            & (F.col("_s_id") >= p_in[pi])
            & (F.col("_d_od") >= p_out[pj])
            & (F.col("_d_id") >= p_in[pj])
        )
        if edge_filter is not None:
            cond = cond & (F.col("psrc") == pverts[pi]) & (F.col("pdst") == pverts[pj])
        return edeg.filter(cond).select("src", "dst")

    def _pair_count(pi: int, pj: int) -> int:
        key = (
            (p_out[pi], p_in[pi], p_out[pj], p_in[pj])
            if edge_filter is None
            else (pi, pj)
        )
        if key not in _pair_rows:
            _pair_rows[key] = edge_table(pi, pj).count()
        return _pair_rows[key]

    def _hinted(df: DataFrame, pi: int, pj: int) -> DataFrame:
        """Extension-join dispatch for the (pi, pj) filtered edge table."""
        if _pair_count(pi, pj) <= SUBGRAPH_BROADCAST_ROWS:
            return F.broadcast(df)
        return df.hint("shuffle_hash")

    def _constraint(df: DataFrame, n_rows: int) -> DataFrame:
        """Semi/anti-join dispatch: broadcast keeps the wedge fan-out
        streaming inside the extension stage (see the threshold note)."""
        if n_rows <= SUBGRAPH_SEMI_BROADCAST_ROWS:
            return F.broadcast(df)
        return df.hint("shuffle_hash")

    def vert_table(pi: int) -> DataFrame:
        pruned = degs.filter(
            (F.col("_od") >= p_out[pi]) & (F.col("_id") >= p_in[pi])
        ).select("vid")
        if node_filter is not None:
            allowed = node_filter.filter(F.col("pv") == pverts[pi]).select("vid")
            pruned = pruned.join(allowed, "vid", "left_semi")
        return pruned

    if reorder_type == "probability":
        cand_counts = {i: vert_table(i).count() for i in range(k)}
        order = _pattern_order(k, pedges, candidate_counts=cand_counts)
    else:
        order = _pattern_order(k, pedges)

    def _timed_out() -> bool:
        return (
            time_limit is not None
            and (_time.monotonic() - t_start) > time_limit * 60.0
        )

    # level 0
    state = vert_table(order[0]).select(F.col("vid").alias(f"m{order[0]}"))
    state = state.localCheckpoint(eager=True)
    bound = [order[0]]

    for vi in order[1:]:
        if _timed_out():
            # abort: no complete embeddings exist mid-search in a
            # level-synchronous engine — empty result, full schema
            state = state.limit(0)
            for vj in order[len(bound):]:
                state = state.withColumn(f"m{vj}", F.lit(None).cast("long"))
            bound = list(order)
            break
        fwd = [vj for vj in bound if (vi, vj) in pedge_set]  # vi -> bound
        bwd = [vj for vj in bound if (vj, vi) in pedge_set]  # bound -> vi
        new = f"m{vi}"

        def _ext_leg(st: DataFrame, kind: str, anchor: int) -> DataFrame:
            if kind == "b":
                tbl = _hinted(edge_table(anchor, vi).select(
                    F.col("src").alias(f"m{anchor}"), F.col("dst").alias(new)
                ), anchor, vi)
            else:
                tbl = _hinted(edge_table(vi, anchor).select(
                    F.col("dst").alias(f"m{anchor}"), F.col("src").alias(new)
                ), vi, anchor)
            return st.join(tbl, f"m{anchor}")

        def _semi(st: DataFrame, kind: str, vj: int) -> DataFrame:
            if kind == "b":
                tbl = _constraint(edge_table(vj, vi).select(
                    F.col("src").alias(f"m{vj}"), F.col("dst").alias(new)
                ), _pair_count(vj, vi))
            else:
                tbl = _constraint(edge_table(vi, vj).select(
                    F.col("dst").alias(f"m{vj}"), F.col("src").alias(new)
                ), _pair_count(vi, vj))
            return st.join(tbl, [f"m{vj}", new], "left_semi")

        # constraints into the bound set, cheapest filtered table first
        cons = sorted(
            [("b", vj, _pair_count(vj, vi)) for vj in bwd]
            + [("f", vj, _pair_count(vi, vj)) for vj in fwd],
            key=lambda t: t[2],
        )
        if len(cons) >= 2:
            # PER-ROW min-degree extension (the generalized degree-ordered
            # orientation that makes the triangles kernel hub-safe): each
            # state row extends along whichever of its two cheapest
            # constraint endpoints has the smaller fan-out degree and
            # semi-probes the other, so the level's intermediate is
            # Σ min(degA, degB) rows instead of Σ degA — on power-law
            # graphs this both collapses the wedge blowup (hub×normal
            # pairs take the normal side) and removes the single-hub
            # shuffle-partition hot spot that capped scaling (a key k is
            # chosen for extension only by rows whose OTHER endpoint is
            # even hotter, so per-key work stays bounded). The split legs
            # compute identical candidate sets per row (all constraints
            # hold either way), so the union is exact, not heuristic.
            (ka, va, _), (kb, vb, _) = cons[0], cons[1]
            da = degs.select(
                F.col("vid").alias(f"m{va}"),
                (F.col("_od") if ka == "b" else F.col("_id")).alias("_dega"),
            )
            db = degs.select(
                F.col("vid").alias(f"m{vb}"),
                (F.col("_od") if kb == "b" else F.col("_id")).alias("_degb"),
            )
            _deg_hint = (
                (lambda df: df.hint("shuffle_hash"))
                if graph.n_vertices > SUBGRAPH_SEMI_BROADCAST_ROWS
                else F.broadcast
            )
            std = (
                state.join(_deg_hint(da), f"m{va}")
                .join(_deg_hint(db), f"m{vb}")
            )
            sA = std.filter(F.col("_dega") <= F.col("_degb")).drop("_dega", "_degb")
            sB = std.filter(F.col("_dega") > F.col("_degb")).drop("_dega", "_degb")
            ext = _semi(_ext_leg(sA, ka, va), kb, vb).unionByName(
                _semi(_ext_leg(sB, kb, vb), ka, va)
            )
            rest = cons[2:]
        elif cons:
            kind, anchor, _ = cons[0]
            ext = _ext_leg(state, kind, anchor)
            rest = []
        else:
            ext = state.crossJoin(vert_table(vi).select(F.col("vid").alias(new)))
            rest = []
        bwd = [vj for knd, vj, _ in rest if knd == "b"]
        fwd = [vj for knd, vj, _ in rest if knd == "f"]

        # candidate vertex must be admissible for this pattern vertex
        if node_filter is not None:
            ext = ext.join(
                vert_table(vi).select(F.col("vid").alias(new)), new, "left_semi"
            )
        # injectivity
        for vj in bound:
            ext = ext.filter(F.col(new) != F.col(f"m{vj}"))
        # remaining required edges — streamed probes over the extension's
        # fan-out (broadcast build below the ceiling: the fan-out is never
        # shuffled, it dies in the same codegen stage it is born in)
        for vj in bwd:
            ext = ext.join(
                _constraint(edge_table(vj, vi).select(
                    F.col("src").alias(f"m{vj}"), F.col("dst").alias(new)
                ), _pair_count(vj, vi)),
                [f"m{vj}", new],
                "left_semi",
            )
        for vj in fwd:
            ext = ext.join(
                _constraint(edge_table(vi, vj).select(
                    F.col("dst").alias(f"m{vj}"), F.col("src").alias(new)
                ), _pair_count(vi, vj)),
                [f"m{vj}", new],
                "left_semi",
            )
        # induced: pattern non-edges must be absent in the graph
        if induced:
            for vj in bound:
                if (vi, vj) not in pedge_set:
                    ext = ext.join(
                        _constraint(E.select(F.col("src").alias(new), F.col("dst").alias(f"m{vj}")), graph.n_edges),
                        [new, f"m{vj}"],
                        "left_anti",
                    )
                if (vj, vi) not in pedge_set:
                    ext = ext.join(
                        _constraint(E.select(F.col("src").alias(f"m{vj}"), F.col("dst").alias(new)), graph.n_edges),
                        [f"m{vj}", new],
                        "left_anti",
                    )
        state = ext.localCheckpoint(eager=True)
        bound.append(vi)
        if state.isEmpty():
            # No partial embeddings survive: bind the remaining pattern
            # vertices as typed nulls so the final select resolves (the
            # result is still an empty DataFrame with the full schema).
            for vj in order[len(bound):]:
                state = state.withColumn(f"m{vj}", F.lit(None).cast("long"))
            break

    edeg.unpersist()
    degs.unpersist()
    E.unpersist()
    out = state.select(*[F.col(f"m{i}").alias(f"g{i}") for i in range(k)])
    if size_limit is not None:
        out = out.limit(int(size_limit))
    return out


def _attr_node_filter(graph, pattern) -> DataFrame | None:
    """(vid, pv): graph vertex admissible for pattern vertex — equality on
    the pattern's node-attribute columns (doAttributesMatch,
    SubgraphSearch.chpl:117-210)."""
    if pattern.node_attributes is None or graph.node_attributes is None:
        return None
    cols = [c for c in pattern.node_attributes.columns if c != "nodes"]
    if not cols:
        return None
    ga = graph.node_attributes
    pa = pattern.node_attributes
    pairs = ga.join(pa.withColumnRenamed("nodes", "pv"), cols).select("nodes", "pv")
    lab = graph.vertices.select(F.col("vid"), F.col("label").alias("nodes"))
    return pairs.join(lab, "nodes").select("vid", "pv")


def _attr_edge_filter(graph, pattern) -> DataFrame | None:
    if pattern.edge_attributes is None or graph.edge_attributes is None:
        return None
    cols = [c for c in pattern.edge_attributes.columns if c not in ("src", "dst")]
    if not cols:
        return None
    ga = graph.edge_attributes
    pa = pattern.edge_attributes.select(
        F.col("src").alias("psrc"), F.col("dst").alias("pdst"), *cols
    )
    pairs = ga.join(pa, cols).select("src", "dst", "psrc", "pdst")
    vs = graph.vertices.select(F.col("label").alias("src"), F.col("vid").alias("_s"))
    vd = graph.vertices.select(F.col("label").alias("dst"), F.col("vid").alias("_d"))
    return (
        pairs.join(vs, "src")
        .join(vd, "dst")
        .select(F.col("_s").alias("src"), F.col("_d").alias("dst"), "psrc", "pdst")
    )


def subgraph_isomorphism(
    graph,
    pattern,
    return_count: bool = False,
    size_limit: int | None = None,
    time_limit: float | None = None,
    return_isos_as: str = "vertices",
    reorder_type: str = "structural",
    algorithm_type: str = "si",
    print_progress_interval: int | None = None,
):
    """All induced embeddings of ``pattern`` (a PropGraph/DiGraph) in
    ``graph``, with attribute matching when both carry attributes —
    ar.subgraph_isomorphism parity (methods.py:427-612). Embedding columns
    are graph *labels* in pattern-vertex order.

    ``return_isos_as``: "vertices" (one row per embedding, g0..g{k-1}),
    "edges" (one row per realized pattern edge: emb columns + psrc/pdst/
    src/dst), "complete" (vertices + the edge mapping), "count"
    (methods.py:460-467). ``size_limit``/``time_limit``/``reorder_type``
    as in :func:`subgraph_search`. ``algorithm_type`` (reference 'si':
    edge-centric states, vs 'ps': parallel VF2) is validated for API
    parity — the join engine IS the 'si' shape (states extend along
    existing edges), so both values run the same plan.
    ``print_progress_interval`` accepted for parity; per-level progress
    lives in the Spark UI."""
    if algorithm_type not in ("si", "ps"):
        raise ValueError(f"unknown algorithm_type: {algorithm_type!r}")
    return _search_api(
        graph, pattern, induced=True, return_count=return_count,
        size_limit=size_limit, time_limit=time_limit,
        return_isos_as=return_isos_as, reorder_type=reorder_type,
    )


def subgraph_monomorphism(
    graph,
    pattern,
    return_count: bool = False,
    size_limit: int | None = None,
    time_limit: float | None = None,
    return_isos_as: str = "vertices",
    reorder_type: str = "structural",
):
    """Non-induced variant (pattern edges required, non-edges ignored)."""
    return _search_api(
        graph, pattern, induced=False, return_count=return_count,
        size_limit=size_limit, time_limit=time_limit,
        return_isos_as=return_isos_as, reorder_type=reorder_type,
    )


def _search_api(
    graph,
    pattern,
    induced: bool,
    return_count: bool,
    size_limit: int | None = None,
    time_limit: float | None = None,
    return_isos_as: str = "vertices",
    reorder_type: str = "structural",
):
    if return_isos_as not in ("vertices", "edges", "complete", "count"):
        raise ValueError(f"unknown return_isos_as: {return_isos_as!r}")
    pedges = [
        (r["src_label"], r["dst_label"]) for r in pattern.edge_list().collect()
    ]
    pverts = [r["label"] for r in pattern.nodes().collect()]
    nf = _attr_node_filter(graph, pattern) if hasattr(pattern, "node_attributes") else None
    ef = _attr_edge_filter(graph, pattern) if hasattr(pattern, "edge_attributes") else None
    emb = subgraph_search(
        graph, pedges, pattern_vertices=pverts, induced=induced,
        node_filter=nf, edge_filter=ef,
        size_limit=size_limit, time_limit=time_limit, reorder_type=reorder_type,
    )
    if return_count or return_isos_as == "count":
        return emb.count()
    # map vids back to labels
    out = emb
    for i in range(len(pverts)):
        lab = graph.vertices.select(
            F.col("vid").alias(f"g{i}"), F.col("label").alias(f"v{i}")
        )
        out = out.join(lab, f"g{i}")
    verts = out.select(*[F.col(f"v{i}").alias(f"g{i}") for i in range(len(pverts))])
    if return_isos_as == "vertices":
        return verts
    # edge view: one row per (embedding, pattern edge) — the reference's
    # m*k segmented edge array (methods.py:483-487) as a long table
    vidx = {v: i for i, v in enumerate(pverts)}
    edge_rows = None
    for a, b in pedges:
        part = verts.select(
            *[F.col(f"g{i}") for i in range(len(pverts))],
            F.lit(a).alias("psrc"),
            F.lit(b).alias("pdst"),
            F.col(f"g{vidx[a]}").alias("src"),
            F.col(f"g{vidx[b]}").alias("dst"),
        )
        edge_rows = part if edge_rows is None else edge_rows.unionAll(part)
    if return_isos_as == "edges":
        return edge_rows.select("psrc", "pdst", "src", "dst")
    return edge_rows  # "complete": vertices + edge mapping per row
