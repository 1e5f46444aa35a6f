"""Incremental streaming connected components: stream == batch, merge
accounting, epoch-replay idempotence, foreachBatch end-to-end."""

from pyspark.sql import functions as F

from arkouda_njit_spark import Graph
from arkouda_njit_spark.operators import connected_components
from arkouda_njit_spark.streaming import (
    StreamingConnectedComponents,
    stream_connected_components,
)

# two cliques, a path, isolated pairs — plus cross-batch merges
BATCH1 = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (20, 21)]
BATCH2 = [(30, 31), (31, 32), (2, 10)]          # merges {0..2} with {10..12}
BATCH3 = [(21, 30), (40, 41)]                   # merges {20,21} with {30..32}
ALL = BATCH1 + BATCH2 + BATCH3


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _labels_dict(sink):
    return {r["vid"]: r["label"] for r in sink.labels().collect()}


def test_stream_equals_batch(spark, tmp_path):
    sink = StreamingConnectedComponents(spark, str(tmp_path / "ccstate"))
    for i, b in enumerate([BATCH1, BATCH2, BATCH3]):
        sink.process_batch(_df(spark, b), epoch_id=i)
    got = _labels_dict(sink)

    g = Graph.from_edges(spark, [u for u, _ in ALL], [v for _, v in ALL])
    vid2label = {r["vid"]: r["label"] for r in g.vertices.collect()}
    batch_cc = {
        vid2label[r["vid"]]: r["component"]
        for r in connected_components(g).collect()
    }
    # internal remapped component ids differ from raw vids; compare the
    # PARTITIONS (same groups), and the streaming labels' min-vid form
    from collections import defaultdict

    def groups(d):
        by = defaultdict(frozenset)
        tmp = defaultdict(set)
        for k, v in d.items():
            tmp[v].add(k)
        return {frozenset(s) for s in tmp.values()}

    assert groups(got) == groups(batch_cc)
    # streaming labels are the component minimum original vid
    for vid, lab in got.items():
        assert lab == min(m for m in got if got[m] == lab)


def test_merge_counts_and_pure_growth(spark, tmp_path):
    sink = StreamingConnectedComponents(spark, str(tmp_path / "cc2"))
    # fresh vertices enter as singletons: two edges = two singleton merges
    assert sink.process_batch(_df(spark, [(0, 1), (2, 3)]), 0) == 2
    assert _labels_dict(sink) == {0: 0, 1: 0, 2: 2, 3: 2}
    # one merge pair: components 0 and 2
    assert sink.process_batch(_df(spark, [(1, 2)]), 1) == 1
    assert _labels_dict(sink) == {0: 0, 1: 0, 2: 0, 3: 0}
    assert sink.n_components == 1
    # an edge inside an existing component is pure growth: no merge
    assert sink.process_batch(_df(spark, [(0, 3)]), 2) == 0
    # chain of merges through a fresh vertex: (4,5) singleton-merge, then
    # 5-0 folds the pair into component 0 — counted via the contracted map
    assert sink.process_batch(_df(spark, [(4, 5), (5, 0)]), 3) == 2
    assert _labels_dict(sink)[4] == 0 and _labels_dict(sink)[5] == 0


def test_epoch_replay_is_idempotent(spark, tmp_path):
    sink = StreamingConnectedComponents(spark, str(tmp_path / "cc3"))
    sink.process_batch(_df(spark, [(0, 1)]), epoch_id=0)
    sink.process_batch(_df(spark, [(1, 2)]), epoch_id=1)
    want = _labels_dict(sink)
    # replay of epoch 1 after a simulated failure: must be a no-op
    assert sink.process_batch(_df(spark, [(1, 2)]), epoch_id=1) == 0
    assert _labels_dict(sink) == want


def test_self_loops_and_duplicate_edges_ignored(spark, tmp_path):
    sink = StreamingConnectedComponents(spark, str(tmp_path / "cc4"))
    # the three (8,9) spellings collapse to one edge = one singleton merge;
    # a self-loop-only vertex never enters the state (no surviving edge)
    assert sink.process_batch(_df(spark, [(7, 7), (8, 9), (9, 8), (8, 9)]), 0) == 1
    assert _labels_dict(sink) == {8: 8, 9: 8}


def test_foreachbatch_end_to_end(spark, tmp_path):
    in_dir = tmp_path / "edges_in"
    in_dir.mkdir()
    _df(spark, ALL).coalesce(1).write.mode("overwrite").parquet(
        str(in_dir / "b")
    )
    stream = spark.readStream.schema("src long, dst long").parquet(
        str(in_dir / "b")
    )
    q = stream_connected_components(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)
    q.stop()
    sink = StreamingConnectedComponents(spark, str(tmp_path / "state"))
    labs = _labels_dict(sink)
    assert set(labs) == {u for e in ALL for u in e}
    assert sink.n_components == 3  # {0..2,10..12}, {20,21,30..32}, {40,41}
