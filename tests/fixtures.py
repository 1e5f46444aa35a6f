"""Golden test graphs from the reference suite (FIXTURES.md §3).

Edge lists are the literal arrays committed in
/root/reference/arachne/tests/algorithm_test.py and generators.py.
"""

# algo28 — main algorithm test graph (algorithm_test.py:10-12)
ALGO28_SRC = [2,5,2,3,3,3,3,2,3,4,5,5,5,5,5,5,7,8,9,9,8,9,10,10,10,24,25,25]
ALGO28_DST = [1,0,0,0,3,3,3,3,4,3,5,2,2,2,2,7,8,9,8,8,5,10,7,7,7,24,26,27]
ALGO28_WGT = [1]*26 + [10,20]

# cc17 — connected components / diameter graph (algorithm_test.py:274-276)
CC17_SRC = [1, 2, 3, 4, 5, 6, 10, 12, 14, 15]
CC17_DST = [2, 3, 4, 5, 6, 7, 11, 11, 16, 16]

# tc10 — triangle centrality graph (algorithm_test.py:139-151)
TC10_SRC = [0, 1, 2, 3, 4, 4, 5, 6, 7, 8, 0]
TC10_DST = [1, 2, 0, 0, 3, 0, 6, 7, 5, 9, 0]

# truss10 — k-truss graph (algorithm_test.py:299-307)
TRUSS10_SRC = [0, 1, 2, 3, 4, 5, 6, 7, 8, 0, 2, 7, 7, 5, 6, 2, 2, 6, 1, 5, 2, 1, 1]
TRUSS10_DST = [1, 2, 0, 0, 0, 6, 7, 5, 9, 0, 5, 9, 6, 8, 8, 7, 8, 9, 8, 9, 6, 5, 8]


def python_pagerank(nxg, alpha=0.85, tol=1e-6, weight=None, max_iter=100):
    """Pure-python power iteration with networkx.pagerank semantics
    (nx needs scipy, absent here): right-stochastic by out-weight,
    dangling mass redistributed uniformly, stop when L1 err < n*tol."""
    nodes = list(nxg.nodes())
    n = len(nodes)
    x = {v: 1.0 / n for v in nodes}
    outw = {}
    for v in nodes:
        if nxg.is_directed():
            nbrs = nxg.succ[v]
        else:
            nbrs = nxg.adj[v]
        outw[v] = sum((d.get(weight, 1) if weight else 1) for d in nbrs.values())
    for _ in range(max_iter):
        nxt = {v: 0.0 for v in nodes}
        dangle = sum(x[v] for v in nodes if outw[v] == 0)
        for u in nodes:
            if outw[u] == 0:
                continue
            nbrs = nxg.succ[u] if nxg.is_directed() else nxg.adj[u]
            for v, d in nbrs.items():
                w = d.get(weight, 1) if weight else 1
                nxt[v] += alpha * x[u] * w / outw[u]
        for v in nodes:
            nxt[v] += (1 - alpha) / n + alpha * dangle / n
        err = sum(abs(nxt[v] - x[v]) for v in nodes)
        x = nxt
        if err < n * tol:
            break
    return x


def nx_graph(src, dst, wgt=None, directed=False, no_self_loops=True):
    """nx oracle matching the engine's defaults: self-loop edges are
    filtered from the input arrays BEFORE construction (reference
    graphclass.py:199-203 default), so loop-only vertices vanish too."""
    import networkx as nx

    g = nx.DiGraph() if directed else nx.Graph()
    if no_self_loops:
        triples = [
            (s, d, 1.0 if wgt is None else w)
            for s, d, w in zip(src, dst, wgt or [1.0] * len(src))
            if s != d
        ]
        src = [t[0] for t in triples]
        dst = [t[1] for t in triples]
        wgt = None if wgt is None else [t[2] for t in triples]
    if wgt is None:
        g.add_edges_from(zip(src, dst))
    else:
        g.add_weighted_edges_from(zip(src, dst, wgt))
    return g
