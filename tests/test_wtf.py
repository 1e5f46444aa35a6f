"""Who-to-follow: recommendation semantics on a hand-built follow graph."""

import pytest

from arkouda_njit_spark import DiGraph
from arkouda_njit_spark.operators import who_to_follow

# user 0 follows 1 and 2. 1,2,3 all follow 50 (a popular account user 0
# does NOT follow). 1 follows 60, 2 follows 61. A far cluster 90..93 is
# unrelated to user 0's neighborhood.
FOLLOWS = [
    (0, 1), (0, 2),
    (1, 50), (2, 50), (3, 50),
    (1, 3), (2, 3),
    (1, 60), (2, 61),
    (90, 91), (91, 92), (92, 93), (93, 90),
]


def _g(spark):
    return DiGraph.from_edges(
        spark, [u for u, _ in FOLLOWS], [v for _, v in FOLLOWS]
    )


def test_recommends_the_collectively_endorsed_account(spark):
    recs = who_to_follow(
        _g(spark), user=0, k=5, circle_size=10, ppr_iterations=6, salsa_iterations=4
    ).collect()
    nodes = [r["node"] for r in recs]
    # 50 is endorsed by the whole circle: top recommendation
    assert nodes[0] == 50
    # the user itself and already-followed accounts never appear
    assert 0 not in nodes and 1 not in nodes and 2 not in nodes
    # the unrelated far cluster is not reachable from the circle
    assert not set(nodes) & {90, 91, 92, 93}
    # scores are ordered
    auths = [r["auth"] for r in recs]
    assert auths == sorted(auths, reverse=True)


def test_k_bounds_and_determinism(spark):
    g = _g(spark)
    a = [tuple(r) for r in who_to_follow(g, user=0, k=3, circle_size=10, ppr_iterations=4, salsa_iterations=2).collect()]
    b = [tuple(r) for r in who_to_follow(g, user=0, k=3, circle_size=10, ppr_iterations=4, salsa_iterations=2).collect()]
    assert a == b
    assert len(a) <= 3


def test_guards(spark):
    g = _g(spark)
    with pytest.raises(ValueError):
        who_to_follow(g, user=0, k=0)
    with pytest.raises(ValueError):
        who_to_follow(g, user=0, circle_size=0)


def test_montecarlo_circle_matches_exact_recommendations(spark):
    g = _g(spark)
    exact = who_to_follow(
        g, user=0, k=3, circle_size=10, ppr_iterations=20, salsa_iterations=6
    ).collect()
    mc = who_to_follow(
        g, user=0, k=3, circle_size=10, salsa_iterations=6,
        method="montecarlo", mc_walks=600, mc_max_steps=10, mc_seed=9,
    ).collect()
    # the circle only needs the PPR RANKING; with 600 walks on this tiny
    # neighborhood the MC circle equals the exact one, so the SALSA stage
    # sees the same projection and the recommendations agree exactly
    # (10 steps keeps the sequential-job count — and the suite's wall —
    # bounded; deeper walks only shave truncation bias the ranking
    # doesn't need)
    assert [r["node"] for r in mc] == [r["node"] for r in exact]


def test_method_guard(spark):
    with pytest.raises(ValueError):
        who_to_follow(_g(spark), user=0, method="nope")
