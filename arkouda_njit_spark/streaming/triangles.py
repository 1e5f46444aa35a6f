"""Incremental triangle counting over edge micro-batches.

Reference (dev tree): streaming triangle count over streamed edge
partitions — arachne_development/server/TriCntMsgD.chpl:3213-3216
(``segmentedStreamTri``); SURVEY.md §2.5 maps it to Structured Streaming's
``foreachBatch``.

Design: maintain an accumulated edge set E (canonical u<v, parquet-backed
state). For each incoming batch B (deduped against E):
    Δtriangles = tri(B, E, E) + tri(B, B, E) + tri(B, B, B)
counted as: wedges with at least one batch edge, closed by any edge in
E ∪ B — computed as (all wedges over E∪B closing) minus (wedges over E
closing) = count(E∪B) − count(E), but incrementally cheaper: only wedges
touching a batch edge are enumerated. State and the running count are
exactly-once via the foreachBatch epoch id."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _canon(df: DataFrame) -> DataFrame:
    return (
        df.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )


def _delta_triangles(batch: DataFrame, state: DataFrame) -> int:
    """Triangles added by `batch` edges against `state` (state excludes batch).

    A new triangle contains >=1 batch edge. Enumerate wedges where at least
    one leg is a batch edge over U = state ∪ batch, close against U, and
    de-overlap by inclusion-exclusion on which legs are new: count each new
    triangle once by requiring the *lexicographically first new leg* — here
    simpler: enumerate all triangles in U touching >=1 batch edge via a
    tagged union and count distinct triangle keys."""
    union = state.select("u", "v", F.lit(0).alias("is_new")).unionAll(
        batch.select("u", "v", F.lit(1).alias("is_new"))
    )
    sym = union.select(F.col("u").alias("a"), F.col("v").alias("b"), "is_new").unionAll(
        union.select(F.col("v").alias("a"), F.col("u").alias("b"), "is_new")
    )
    # wedges pivoting at p: (p,b), (p,c) with b < c; close with (b,c) in
    # union; keep triangles touching >=1 new edge; dedup by sorted triple
    w1 = sym.select(F.col("a").alias("p"), F.col("b"), F.col("is_new").alias("n1"))
    w2 = sym.select(F.col("a").alias("p"), F.col("b").alias("c"), F.col("is_new").alias("n2"))
    tri = (
        w1.join(w2, "p")
        .filter(F.col("b") < F.col("c"))
        .join(
            union.select(
                F.col("u").alias("b"), F.col("v").alias("c"), F.col("is_new").alias("n3")
            ),
            ["b", "c"],
        )
        .filter((F.col("n1") + F.col("n2") + F.col("n3")) > 0)
        .select(F.array_sort(F.array("p", "b", "c")).alias("t"))
        .distinct()
    )
    # each triangle appears once per pivot choice; distinct() dedups
    return tri.count()


class StreamingTriangleCounter:
    """foreachBatch sink maintaining an edge-set state dir + running count."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.edges_path = os.path.join(state_dir, "edges")
        self.count_path = os.path.join(state_dir, "count.json")
        os.makedirs(state_dir, exist_ok=True)

    @property
    def total(self) -> int:
        if os.path.exists(self.count_path):
            with open(self.count_path) as f:
                return json.load(f)["triangles"]
        return 0

    def _state(self) -> DataFrame:
        if os.path.exists(os.path.join(self.edges_path, "_SUCCESS")):
            return self.spark.read.parquet(self.edges_path)
        return self.spark.createDataFrame([], "u long, v long")

    def process_batch(self, batch_df: DataFrame, epoch_id: int | None = None) -> int:
        batch = _canon(batch_df).localCheckpoint(eager=True)
        state = self._state().localCheckpoint(eager=True)
        fresh = batch.join(state, ["u", "v"], "left_anti").localCheckpoint(eager=True)
        if fresh.isEmpty():
            return self.total
        delta = _delta_triangles(fresh, state)
        new_state = state.unionAll(fresh)
        new_state.write.mode("overwrite").parquet(self.edges_path)
        total = self.total + delta
        with open(self.count_path, "w") as f:
            json.dump({"triangles": total, "epoch": epoch_id}, f)
        return total


def streaming_triangle_count(
    edge_stream: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Attach the incremental counter to a streaming (src,dst) DataFrame.
    Returns the StreamingQuery; read progress via
    ``StreamingTriangleCounter(spark, state_dir).total``."""
    counter = StreamingTriangleCounter(edge_stream.sparkSession, state_dir)
    return (
        edge_stream.writeStream.foreachBatch(
            lambda df, epoch: counter.process_batch(df, epoch)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
