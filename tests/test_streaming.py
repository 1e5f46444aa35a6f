"""Structured Streaming: windowed counts, sessions, incremental triangles."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.streaming import sessionize, windowed_event_counts
from arkouda_njit_spark.streaming.triangles import StreamingTriangleCounter

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    static = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = sorted(
        map(tuple, windowed_event_counts(static, window="1 hour").collect())
    )

    # streaming file source requires a directory
    in_dir = tmp_path / "events_in"
    in_dir.mkdir()
    import shutil

    shutil.copy(f"{SF_DIR}/events.parquet", in_dir / "part-0.parquet")
    stream = spark.readStream.schema(static.schema).parquet(str(in_dir))
    agg = windowed_event_counts(stream, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from win_counts").collect()))
    assert got == expected and len(got) > 0


def test_sessionize_static(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 01:30:00"),  # gap > 30min -> new session
            (2, "2024-01-01 00:05:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    got = sessionize(events, gap="30 minutes").collect()
    per_user = {}
    for r in got:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_sessionize_static_matches_streaming(spark, tmp_path):
    """A batch backfill and the live stream must produce the SAME session
    table — including the exactly-at-gap boundary (session windows
    touching at the boundary MERGE, verified against session_window) and
    session_end = last event + gap (the window end, not max(ts))."""
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:30:00"),  # exactly gap later -> MERGES
        (1, "2024-01-01 00:40:00"),
        (2, "2024-01-01 00:05:00"),
    ]
    static = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got_static = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(static, gap="30 minutes").collect()
    }
    src_dir = tmp_path / "sess_in"
    static.write.parquet(str(src_dir))
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(str(src_dir))
    q = (
        sessionize(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_par")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.table("sess_par").collect()
    }
    assert got_static == got_stream
    assert len(got_static) == 2  # user1 merges across the exact-gap boundary


def test_streaming_triangle_count_incremental(spark, tmp_path):
    """Feed edges in two batches; running total equals nx on the union."""
    batch1 = [(0, 1), (1, 2), (2, 0), (2, 3)]          # one triangle
    batch2 = [(3, 0), (3, 1), (5, 6)]                  # adds: (0,2,3)? (0,1,3), (0,3,2)...
    counter = StreamingTriangleCounter(spark, str(tmp_path / "state"))

    df1 = spark.createDataFrame(batch1, "src long, dst long")
    t1 = counter.process_batch(df1)
    g = nx.Graph(batch1)
    assert t1 == sum(nx.triangles(g).values()) // 3

    df2 = spark.createDataFrame(batch2, "src long, dst long")
    t2 = counter.process_batch(df2)
    g.add_edges_from(batch2)
    assert t2 == sum(nx.triangles(g).values()) // 3

    # replay of an already-seen batch adds nothing (dedup against state)
    t3 = counter.process_batch(df1)
    assert t3 == t2


def test_streaming_triangle_epoch_replay_idempotent(spark, tmp_path):
    """A redelivered foreachBatch epoch (crash replay) is skipped via the
    manifest's last-applied epoch — even if the batch contents would
    otherwise change the count (ADVICE r1, medium)."""
    counter = StreamingTriangleCounter(spark, str(tmp_path / "state_ep"))
    df1 = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    t1 = counter.process_batch(df1, epoch_id=0)
    assert t1 == 1
    # replay epoch 0 with different edges: must be a no-op
    df_replay = spark.createDataFrame([(0, 3), (1, 3)], "src long, dst long")
    assert counter.process_batch(df_replay, epoch_id=0) == 1
    assert counter.total == 1
    # next epoch applies normally
    t2 = counter.process_batch(df_replay, epoch_id=1)
    assert t2 == 2  # {0,1,3} closes
    # state and count live in ONE atomically-replaced manifest
    import json
    import os

    with open(counter.manifest_path) as f:
        m = json.load(f)
    assert m["triangles"] == 2 and m["epoch"] == 1 and m["edges_dir"]
    assert os.path.exists(os.path.join(counter.state_dir, m["edges_dir"], "_SUCCESS"))


def test_streaming_triangle_legacy_state_migrates(spark, tmp_path):
    """A state dir written by the pre-manifest layout (count.json +
    edges/) is picked up instead of silently resetting to zero."""
    import json
    import os

    state_dir = tmp_path / "legacy"
    state_dir.mkdir()
    spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "u long, v long").write.parquet(
        str(state_dir / "edges")
    )
    with open(state_dir / "count.json", "w") as f:
        json.dump({"triangles": 1, "epoch": 4}, f)
    counter = StreamingTriangleCounter(spark, str(state_dir))
    assert counter.total == 1
    # new edge closing against the LEGACY edge set is counted
    t = counter.process_batch(
        spark.createDataFrame([(0, 3), (1, 3)], "src long, dst long"), epoch_id=5
    )
    assert t == 2
    assert os.path.exists(counter.manifest_path)  # migrated to new layout


def test_streaming_triangle_query(spark, tmp_path):
    """End-to-end: file-source stream -> foreachBatch counter."""
    src_dir = tmp_path / "edges_in"
    src_dir.mkdir()
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3)], "src long, dst long"
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir))

    from arkouda_njit_spark.streaming import streaming_triangle_count

    stream = spark.readStream.schema("src long, dst long").parquet(str(src_dir))
    q = streaming_triangle_count(
        stream, str(tmp_path / "state2"), str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    counter = StreamingTriangleCounter(spark, str(tmp_path / "state2"))
    assert counter.total == 2  # triangles {0,1,2} and {0,1,3}


def test_stateful_running_user_stats(spark, tmp_path):
    """applyInPandasWithState custom operator: running per-user stats
    across two micro-batches, verified against a batch aggregation."""
    from arkouda_njit_spark.streaming.stateful import running_user_stats

    in_dir = tmp_path / "ev_in"
    in_dir.mkdir()
    b1 = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
    )
    b1.coalesce(1).write.parquet(str(in_dir / "b1"))

    stream = spark.readStream.schema("user_id long, value double").parquet(
        str(in_dir) + "/*"
    )
    out = running_user_stats(stream)
    # one continuous query; the second micro-batch arrives mid-stream and
    # the state must carry over (maxFilesPerTrigger=1 forces two batches)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(processingTime="1 second")
        .start()
    )
    q.processAllAvailable()
    b2 = spark.createDataFrame([(1, 20.0), (3, 7.0)], "user_id long, value double")
    b2.coalesce(1).write.parquet(str(in_dir / "b2"))
    q.processAllAvailable()
    q.stop()

    import pandas as pd

    pdf = spark.sql("select * from user_stats").toPandas()
    # update mode appends one row per key per batch; take the last per user
    last = pdf.groupby("user_id").tail(1).set_index("user_id")
    assert tuple(last.loc[1]) == (3, 35.0, 20.0)  # state carried across batches
    assert tuple(last.loc[3]) == (1, 7.0, 7.0)
    assert tuple(last.loc[2]) == (1, 1.0, 1.0)


def _mk_pages(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(u, ts, h) for u, ts, h in rows], "url string, warc_ts string, html binary"
    ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "html")


def _page(url, targets):
    html = "".join(f'<a href="{t}">l</a>' for t in targets)
    return f"<html><body>{html}</body></html>".encode()


def test_streaming_page_ingest_recrawl_replaces(spark, tmp_path):
    from arkouda_njit_spark.streaming import StreamingPageIngestor

    ing = StreamingPageIngestor(spark, str(tmp_path / "state"))
    a, b, c = "http://s.example/a", "http://s.example/b", "http://s.example/c"
    ing.process_batch(
        _mk_pages(
            spark,
            [
                (a, "2024-01-01 00:00:00", _page(a, [b, b, c])),
                (b, "2024-01-01 00:00:01", _page(b, [a])),
                (c, "2024-01-01 00:00:02", _page(c, [])),
            ],
        ),
        epoch_id=0,
    )
    # re-crawl of a: new outlinks replace the old ones entirely
    ing.process_batch(
        _mk_pages(spark, [(a, "2024-01-02 00:00:00", _page(a, [c]))]), epoch_id=1
    )
    links = {
        (r["url"], r["href"]) for r in ing.links().collect() if r["href"] is not None
    }
    assert links == {(a, c), (b, a)}
    assert ing.n_pages == 3  # a, b, c all still known (c has no outlinks)

    g = ing.snapshot_graph(num_partitions=2)
    edges = {
        (r["src_url"], r["dst_url"], r["weight"])
        for r in g.edges.join(
            g.vertices.select(F.col("vid").alias("src"), F.col("url").alias("src_url")),
            "src",
        )
        .join(
            g.vertices.select(F.col("vid").alias("dst"), F.col("url").alias("dst_url")),
            "dst",
        )
        .select("src_url", "dst_url", "weight")
        .collect()
    }
    assert edges == {(a, c, 1.0), (b, a, 1.0)}


def test_streaming_page_ingest_epoch_replay_idempotent(spark, tmp_path):
    from arkouda_njit_spark.streaming import StreamingPageIngestor

    ing = StreamingPageIngestor(spark, str(tmp_path / "state"))
    a, b = "http://s.example/a", "http://s.example/b"
    batch = _mk_pages(spark, [(a, "2024-01-01 00:00:00", _page(a, [b, b]))])
    ing.process_batch(batch, epoch_id=0)
    before = sorted(map(tuple, ing.links().collect()))
    ing.process_batch(batch, epoch_id=0)  # replayed epoch after a failure
    assert sorted(map(tuple, ing.links().collect())) == before
    assert ing.links().count() == 2  # duplicate links preserved (weight=2)


def test_streaming_page_ingest_end_to_end_matches_batch(spark, tmp_path):
    from arkouda_njit_spark.sources import build_web_graph, generate_pages
    from arkouda_njit_spark.streaming import StreamingPageIngestor, streaming_page_ingest

    pages = generate_pages(spark, n_pages=120, links_per_page=5, seed=9)
    src = tmp_path / "pages_in"
    # two files => at least one multi-batch availableNow pass
    pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).write.parquet(
        str(src / "p0.parquet")
    )
    pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1).write.parquet(
        str(src / "p1.parquet")
    )
    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = streaming_page_ingest(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    ing = StreamingPageIngestor(spark, str(tmp_path / "state"))
    got = ing.snapshot_graph(num_partitions=4)
    want = build_web_graph(generate_pages(spark, n_pages=120, links_per_page=5, seed=9), num_partitions=4)
    got_edges = sorted(map(tuple, got.edges.select("src", "dst", "weight").collect()))
    want_edges = sorted(map(tuple, want.edges.select("src", "dst", "weight").collect()))
    assert got_edges == want_edges
    assert sorted(map(tuple, got.vertices.select("vid", "url").collect())) == sorted(
        map(tuple, want.vertices.select("vid", "url").collect())
    )


def test_streaming_page_snapshot_survives_state_gc(spark, tmp_path):
    """A snapshot taken before the next batch must stay queryable after
    process_batch garbage-collects the state dir it was read from."""
    from arkouda_njit_spark.streaming import StreamingPageIngestor

    ing = StreamingPageIngestor(spark, str(tmp_path / "state"))
    a, b = "http://s.example/a", "http://s.example/b"
    ing.process_batch(
        _mk_pages(spark, [(a, "2024-01-01 00:00:00", _page(a, [b])),
                          (b, "2024-01-01 00:00:01", _page(b, [a]))]),
        epoch_id=0,
    )
    g = ing.snapshot_graph(num_partitions=2)
    ing.process_batch(
        _mk_pages(spark, [(a, "2024-01-02 00:00:00", _page(a, []))]), epoch_id=1
    )
    # old state dir is gone; the snapshot must still answer
    assert g.edges.count() == 2
    assert ing.snapshot_graph(num_partitions=2).edges.count() == 1  # b->a only


def test_streaming_warc_ingest_matches_batch(spark, tmp_path):
    """WARC archives landing in a directory stream into the same link state
    the batch path computes: stream_warc -> streaming_page_ingest over two
    micro-batches == build_web_graph over the full pages table."""
    from arkouda_njit_spark.sources import build_web_graph, generate_pages, stream_warc
    from arkouda_njit_spark.sources.warc import write_warc
    from arkouda_njit_spark.streaming import StreamingPageIngestor, streaming_page_ingest

    pages = generate_pages(spark, n_pages=100, links_per_page=5, seed=3)
    src = tmp_path / "warc_in"
    write_warc(
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).coalesce(1),
        str(src),
        prefix="a",
    ).collect()
    write_warc(
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1).coalesce(1),
        str(src),
        prefix="b",
    ).collect()
    stream = stream_warc(spark, str(src), max_files_per_trigger=1)
    q = streaming_page_ingest(stream, str(tmp_path / "state"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    ing = StreamingPageIngestor(spark, str(tmp_path / "state"))
    got = ing.snapshot_graph(num_partitions=4)
    want = build_web_graph(pages, num_partitions=4)
    assert sorted(map(tuple, got.edges.select("src", "dst", "weight").collect())) == sorted(
        map(tuple, want.edges.select("src", "dst", "weight").collect())
    )
