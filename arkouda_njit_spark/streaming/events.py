"""Structured Streaming operators over event streams.

The reference has no streaming surface (SURVEY.md §2.7); these are the
engine's native-Spark extensions for the events table shape
(event_id, ts, user_id, event_type, value, props): watermarked windowed
aggregation and sessionization. They accept either a static or a streaming
DataFrame (the transformations are identical — that's the point of the
Structured Streaming model)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, window_end, event_type, n, total_value) — tumbling or
    sliding window counts with late-data watermark when streaming."""
    src = events
    if events.isStreaming:
        # watermarks require TIMESTAMP_LTZ; parquet often yields NTZ.
        # Session TZ is pinned to UTC, so the cast is value-preserving.
        src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user sessions.

    Streaming: native ``session_window`` with watermark. Static: the
    classic lag-gap-cumsum window formulation (same output shape):
    (user_id, session_start, session_end, n_events)."""
    if events.isStreaming:
        return (
            events.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )
    from pyspark.sql import Window

    qty, unit = gap.split()
    gap_seconds = int(qty) * {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    # Match Spark's session_window semantics EXACTLY so a batch backfill
    # and the live stream produce the same session table: sessions MERGE
    # when an event lands at or before last+gap (verified empirically —
    # windows touching at the boundary merge), so split on diff > gap,
    # and session_end = last event + gap (the window end, not max(ts)).
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.withColumn(
        "_new_session",
        (
            F.col("ts").cast("long")
            - F.coalesce(F.lag("ts").over(w), F.col("ts")).cast("long")
            > F.lit(gap_seconds)
        ).cast("int"),
    ).withColumn("_session_id", F.sum("_new_session").over(w))
    return marked.groupBy("user_id", "_session_id").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr(f"INTERVAL {gap_seconds} SECONDS")).alias(
            "session_end"
        ),
        F.count("*").alias("n_events"),
    ).drop("_session_id")
