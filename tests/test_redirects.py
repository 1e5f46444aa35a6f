"""Redirect-chain resolution vs a pure-python chain follower."""

import pytest

from arkouda_njit_spark.sources import resolve_redirects, rewrite_to_final

# chains, a loop, a chain into a loop, a self-loop, duplicate sources
REDIRECTS = [
    ("a", "b"), ("b", "c"),               # a->b->c, c terminal
    ("d", "e"),                            # 1 hop
    ("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"),  # length-4 chain
    ("x", "y"), ("y", "x"),               # 2-loop
    ("into", "x"),                         # chain feeding the loop
    ("self", "self"),                      # self-loop
    ("dup", "zzz"), ("dup", "aaa"),        # duplicate source -> min target
]


def _python_resolve(pairs, max_hops):
    f = {}
    for s, d in pairs:
        f[s] = min(f[s], d) if s in f else d
    out = {}
    for u in f:
        cur, hops = f[u], 1
        while cur in f and hops <= max_hops:
            cur, hops = f[cur], hops + 1
        if cur not in f and hops <= max_hops:
            out[u] = (cur, hops, True)
        else:
            out[u] = (None, hops, False)
    return out


def _df(spark):
    return spark.createDataFrame(REDIRECTS, "src string, dst string")


@pytest.mark.parametrize("max_hops", [1, 3, 16])
def test_resolution_matches_python(spark, max_hops):
    got = {
        r["url"]: (r["final_url"], r["resolved"])
        for r in resolve_redirects(_df(spark), max_hops=max_hops).collect()
    }
    want = _python_resolve(REDIRECTS, max_hops)
    assert got.keys() == want.keys()
    for u, (final, _, ok) in want.items():
        assert got[u] == (final, ok), (u, max_hops)


def test_resolved_hops_are_exact_and_unresolved_exceed_cap(spark):
    rows = {r["url"]: r for r in resolve_redirects(_df(spark), max_hops=16).collect()}
    want = _python_resolve(REDIRECTS, 16)
    for u, (_, hops, ok) in want.items():
        if ok:
            assert rows[u]["hops"] == hops, u
    # loops and the chain feeding them: following provably stopped past the cap
    for u in ("x", "y", "into", "self"):
        assert not rows[u]["resolved"]
        assert rows[u]["hops"] > 16, u


def test_duplicate_source_collapses_to_min_target(spark):
    rows = {r["url"]: r for r in resolve_redirects(_df(spark)).collect()}
    assert rows["dup"]["final_url"] == "aaa"


def test_rewrite_to_final(spark):
    edges = spark.createDataFrame(
        [
            ("a", "d", 1.0),      # both endpoints redirect: c -> e
            ("c", "p1", 2.0),     # src terminal, dst resolves to p5
            ("q", "r", 3.0),      # neither appears in the redirect map
            ("a", "x", 4.0),      # dst feeds a loop: edge dropped
            ("self", "q", 5.0),   # src is a self-loop: edge dropped
        ],
        "src string, dst string, weight double",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in rewrite_to_final(edges, _df(spark)).collect()
    }
    assert got == {("c", "e"): 1.0, ("c", "p5"): 2.0, ("q", "r"): 3.0}


def test_max_hops_guard(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_df(spark), max_hops=0)
