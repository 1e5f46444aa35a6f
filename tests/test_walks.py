"""Random walks: validity, determinism, partition invariance, uniformity."""

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark import DiGraph, Graph
from arkouda_njit_spark.operators import random_walks, walk_corpus


def test_walks_are_valid_paths(spark):
    g = DiGraph.from_edges(spark, [0, 0, 1, 2, 3], [1, 2, 3, 3, 0])
    edge_set = {(r["src"], r["dst"]) for r in g.edges.collect()}
    walks = random_walks(g, walk_length=6, walks_per_vertex=2).collect()
    assert len(walks) == g.n_vertices * 2
    for r in walks:
        p = r["path"]
        assert p[0] == r["start"]
        assert len(p) == 7  # every vertex here has an out-edge
        for a, b in zip(p, p[1:]):
            assert (a, b) in edge_set


def test_dead_end_stops_walk(spark):
    g = DiGraph.from_edges(spark, [0, 1], [1, 2])  # 2 is a sink
    walks = {r["start"]: r["path"] for r in random_walks(g, walk_length=5).collect()}
    vid_of = {r["label"]: r["vid"] for r in g.vertices.collect()}
    assert walks[vid_of[0]] == [vid_of[0], vid_of[1], vid_of[2]]
    assert walks[vid_of[2]] == [vid_of[2]]


def test_deterministic_and_partition_invariant(spark):
    import networkx as nx

    nxg = nx.karate_club_graph()
    g = Graph.from_edges(spark, *zip(*nxg.edges()), num_partitions=4)
    g2 = Graph.from_edges(spark, *zip(*nxg.edges()), num_partitions=11)
    a = {r["walk_id"]: tuple(r["path"]) for r in random_walks(g, 8, seed=7).collect()}
    b = {r["walk_id"]: tuple(r["path"]) for r in random_walks(g, 8, seed=7).collect()}
    c = {r["walk_id"]: tuple(r["path"]) for r in random_walks(g2, 8, seed=7).collect()}
    assert a == b == c
    d = {r["walk_id"]: tuple(r["path"]) for r in random_walks(g, 8, seed=8).collect()}
    assert a != d  # a different seed draws different walks


def test_neighbor_choice_roughly_uniform(spark):
    # vertex 0 has two neighbors; over many walks each should get ~half
    g = DiGraph.from_edges(spark, [0, 0, 1, 2], [1, 2, 0, 0])
    walks = random_walks(g, walk_length=1, walks_per_vertex=300).collect()
    vid_of = {r["label"]: r["vid"] for r in g.vertices.collect()}
    firsts = [r["path"][1] for r in walks if r["start"] == vid_of[0]]
    share = firsts.count(vid_of[1]) / len(firsts)
    assert 0.4 < share < 0.6, share


def test_walk_corpus_sentences(spark):
    g = DiGraph.from_edges(spark, [10, 20, 30], [20, 30, 10])
    sents = {r["walk_id"]: r["sentence"] for r in walk_corpus(g, walk_length=3).collect()}
    assert len(sents) == 3
    for s in sents.values():
        toks = s.split(" ")
        assert len(toks) == 4 and set(toks) <= {"10", "20", "30"}


class TestNode2vec:
    def _frac_return(self, spark, p, q, n=400):
        # undirected path 0-1-2: at step 2 (prev=0, cur=1) the choice is
        # return (0, weight 1/p) vs onward (2, weight 1/q — vertex 2 is
        # not a neighbor of 0)
        from arkouda_njit_spark.operators import node2vec_walks

        g = Graph.from_edges(spark, [0, 1], [1, 2])
        vid_of = {r["label"]: r["vid"] for r in g.vertices.collect()}
        walks = node2vec_walks(g, walk_length=2, walks_per_vertex=n, p=p, q=q).collect()
        steps = [
            r["path"][2]
            for r in walks
            if r["start"] == vid_of[0] and len(r["path"]) == 3
        ]
        return steps.count(vid_of[0]) / len(steps)

    def test_low_p_biases_return(self, spark):
        assert self._frac_return(spark, p=0.01, q=1.0) > 0.95

    def test_low_q_biases_outward(self, spark):
        assert self._frac_return(spark, p=100.0, q=0.01) < 0.05

    def test_neutral_is_roughly_uniform(self, spark):
        frac = self._frac_return(spark, p=1.0, q=1.0)
        assert 0.4 < frac < 0.6, frac

    def test_paths_valid_and_deterministic(self, spark):
        import networkx as nx

        from arkouda_njit_spark.operators import node2vec_walks

        nxg = nx.karate_club_graph()
        g = Graph.from_edges(spark, *zip(*nxg.edges()))
        edge_set = {(r["src"], r["dst"]) for r in g.edges.collect()}
        a = {r["walk_id"]: tuple(r["path"]) for r in node2vec_walks(g, 6, p=0.5, q=2.0, seed=3).collect()}
        b = {r["walk_id"]: tuple(r["path"]) for r in node2vec_walks(g, 6, p=0.5, q=2.0, seed=3).collect()}
        assert a == b
        for path in a.values():
            for x, y in zip(path, path[1:]):
                assert (x, y) in edge_set

    def test_invalid_params_raise(self, spark):
        from arkouda_njit_spark.operators import node2vec_walks

        g = Graph.from_edges(spark, [0], [1])
        with pytest.raises(ValueError):
            node2vec_walks(g, p=0.0)
        with pytest.raises(ValueError):
            node2vec_walks(g, q=-1.0)


def _count_loop_jobs(spark, group, fn):
    """Run ``fn()`` with AQE and auto-broadcast pinned off so jobs ==
    actions (AQE materializes exchanges as jobs; a BroadcastHashJoin
    materializes its broadcast side as a separate future job), and return
    the number of jobs in the group."""
    sc = spark.sparkContext
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_one_action_per_step(spark):
    """The walk loop issues ONE action per step: the count on the lazily
    checkpointed frontier (no isEmpty probe — round-4 verdict task 4)."""
    import networkx as nx

    nxg = nx.karate_club_graph()
    g = Graph.from_edges(spark, *zip(*nxg.edges()), num_partitions=4)
    g.edges.localCheckpoint(eager=True)  # keep build jobs out of the group
    g.n_vertices
    res = {}

    def run():
        res["n"] = random_walks(g, walk_length=5, seed=7).count()

    jobs = _count_loop_jobs(spark, "walk-jobs", run)
    assert res["n"] == g.n_vertices
    # 5 step counts + initial state checkpoint (the explicit rep broadcast
    # adds one future job) + final eager result checkpoint + the test's own
    # count — every vertex has out-edges so there is no early-empty round
    assert jobs <= 5 + 5, f"walk loop ran {jobs} jobs for 5 steps"


def test_node2vec_one_action_per_step(spark):
    import networkx as nx

    from arkouda_njit_spark.operators import node2vec_walks

    nxg = nx.karate_club_graph()
    g = Graph.from_edges(spark, *zip(*nxg.edges()), num_partitions=4)
    g.edges.localCheckpoint(eager=True)
    g.n_vertices
    res = {}

    def run():
        res["n"] = node2vec_walks(g, walk_length=5, p=0.5, q=2.0, seed=7).count()

    jobs = _count_loop_jobs(spark, "n2v-jobs", run)
    assert res["n"] == g.n_vertices
    assert jobs <= 5 + 5, f"node2vec loop ran {jobs} jobs for 5 steps"
