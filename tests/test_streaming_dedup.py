"""Streaming dedup: stream == batch criterion, watermark-bounded state,
and per-row SimHash parity with the aggregate kernel."""

import shutil

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions import simhash, simhash_column
from arkouda_njit_spark.streaming import stream_exact_dedup, stream_simhash_dedup

SF_DIR = "/root/testdata/sf0.001"


def test_simhash_column_parity_with_aggregate(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    agg = {r["doc_id"]: r["sh"] for r in simhash(docs, out="sh").collect()}
    row = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", simhash_column("text").alias("sh")).collect()
    }
    # the aggregate version omits token-less docs; the row version scores
    # them 0 — compare on the docs both produce
    assert agg and all(row[d] == v for d, v in agg.items())


def _run_stream(spark, tmp_path, make_sink, name):
    static = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    dup = static.limit(20).withColumn("doc_id", F.col("doc_id") + 100000)
    both = static.unionByName(dup)
    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    both.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "b"))
    stream = spark.readStream.schema(both.schema).parquet(str(in_dir / "b"))
    q = (
        make_sink(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination(120)
    return static, spark.sql(f"select * from {name}")


def test_stream_exact_dedup_drops_copies(spark, tmp_path):
    static, got = _run_stream(
        spark, tmp_path, lambda s: stream_exact_dedup(s), "exact_dedup_stream"
    )
    # one survivor per distinct text; schema passes through unchanged
    n_distinct = static.select("text").distinct().count()
    assert got.count() == n_distinct
    assert got.columns == static.columns
    assert got.select("text").distinct().count() == n_distinct


def test_stream_simhash_dedup_drops_bucket_collisions(spark, tmp_path):
    static, got = _run_stream(
        spark, tmp_path, lambda s: stream_simhash_dedup(s), "simhash_dedup_stream"
    )
    n_sigs = (
        static.select(simhash_column("text").alias("sh")).distinct().count()
    )
    assert got.count() == n_sigs
    assert got.columns == static.columns


def test_watermark_requires_event_time(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    with pytest.raises(ValueError):
        stream_exact_dedup(docs, within="7 days")
    with pytest.raises(ValueError):
        stream_simhash_dedup(docs, within="7 days")


def test_watermarked_dedup_runs_bounded_state(spark, tmp_path):
    static = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(40)
        .withColumn("fetch_ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    )
    dup = static.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    both = static.unionByName(dup)
    in_dir = tmp_path / "wm_in"
    in_dir.mkdir()
    both.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "b"))
    stream = spark.readStream.schema(both.schema).parquet(str(in_dir / "b"))
    q = (
        stream_exact_dedup(stream, event_time_col="fetch_ts", within="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_dedup")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from wm_dedup")
    # all dups arrive inside one micro-batch (within the horizon): dropped
    assert got.count() == static.select("text").distinct().count()
