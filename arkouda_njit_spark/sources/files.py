"""Edge-list file readers: Matrix Market (.mtx) and TSV.

Reference: ``read_matrix_market_file`` (client methods.py:32-88, server
BuildGraphMsg.chpl:198-298) and ``read_tsv_file`` (methods.py:90-144,
distributed block reader BuildGraph.chpl:28-81).

Spark-first: both are one ``spark.read.csv`` — the distributed block read
the reference hand-rolls in Chapel is Spark's native splittable text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import DiGraph, Graph


def read_matrix_market_file(
    spark: SparkSession,
    path: str,
    directed: bool = False,
    only_edges: bool = False,
    comment_header: str = "%",
):
    """Parse a Matrix Market edge list (optionally weighted).

    The header line after comments is ``rows cols nnz`` and is dropped by
    filtering on the known dimensions row (the reference reads it to size
    arrays; we let the scan stay schema-on-read).
    """
    raw = spark.read.text(path).filter(~F.col("value").startswith(comment_header))
    parts = F.split(F.trim(F.col("value")), r"\s+")
    parsed = raw.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
        F.when(F.size(parts) > 2, parts.getItem(2).cast("double"))
        .otherwise(F.lit(1.0))
        .alias("weight"),
        F.size(parts).alias("_nf"),
        F.monotonically_increasing_id().alias("_rowid"),
    )
    # Drop the dimensions line: it is the first non-comment row.
    first_id = parsed.agg(F.min("_rowid")).collect()[0][0]
    with_nf = parsed.filter(F.col("_rowid") != first_id).drop("_rowid")
    # a third data column marks a weighted matrix — the reference auto-sets
    # weighted=True for 'coordinate real' files (methods.py:70-76)
    max_nf = with_nf.agg(F.max("_nf")).collect()[0][0] or 2
    edges = with_nf.drop("_nf")
    if only_edges:
        return edges
    cls = DiGraph if directed else Graph
    return cls.from_edges(spark, edges, weighted=max_nf > 2)


def read_tsv_file(
    spark: SparkSession,
    path: str,
    directed: bool = False,
    weighted: bool = False,
    only_edges: bool = False,
):
    """Whitespace/tab-delimited edge list (reference methods.py:90-144)."""
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0).filter(
        ~F.col("value").startswith("#")
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    edges = raw.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
        (
            F.when(F.size(parts) > 2, parts.getItem(2).cast("double")).otherwise(F.lit(1.0))
            if weighted
            else F.lit(1.0)
        ).alias("weight"),
    )
    if only_edges:
        return edges
    cls = DiGraph if directed else Graph
    return cls.from_edges(spark, edges, weighted=weighted)


def write_cluster_file(df: DataFrame, path: str) -> None:
    """WCC-style sink: (vertex, cluster) TSV lines —
    WellConnectedComponents.chpl:244-299."""
    df.select(
        F.concat_ws("\t", F.col(df.columns[0]), F.col(df.columns[1])).alias("value")
    ).write.mode("overwrite").text(path)


def read_cluster_file(spark: SparkSession, path: str) -> DataFrame:
    """WCC cluster reader: ``node\\tcluster`` lines →
    (node long, cluster long) — WellConnectedComponents.chpl:99-135."""
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            parts.getItem(0).cast("long").alias("node"),
            parts.getItem(1).cast("long").alias("cluster"),
        )
    )
