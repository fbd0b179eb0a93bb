"""Native Structured Streaming window/join operators over the clips stream.

The reference's batch model has no event time (SURVEY.md §1.3); these are
the Spark-native constructs the north rule adds: tumbling / sliding /
session windows under an event-time watermark, and the stateful
stream–stream self-join on blocking key that replaces the reference's batch
block self-join (MergeMusicTripletCreator.java:25-49) in full-streaming
mode.

All functions take a *streaming* DataFrame of clips (already watermarked or
not — they apply ``withWatermark`` themselves) and return a streaming
DataFrame ready for ``writeStream``. The same expressions run unchanged on
a batch DataFrame (used by the oracle checks: q_tumbling_window etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import music_blocking_label


def tumbling_arrivals(
    clips: DataFrame, window: str = "10 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Arrival counts per tumbling window × blocking key."""
    return (
        clips.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window).alias("w"),
            music_blocking_label(F.col("transcript"), 4).alias("blocking_key"),
        )
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select(F.col("w.start").alias("win_start"), "blocking_key", "n_clips")
    )


def sliding_arrivals(
    clips: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Arrival counts per sliding window."""
    return (
        clips.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select(F.col("w.start").alias("win_start"), "n_clips")
    )


def session_arrivals(
    clips: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-source session windows (gap-based)."""
    return (
        clips.withWatermark("event_time", watermark)
        .groupBy("source", F.session_window("event_time", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select(
            "source", F.col("w.start").alias("session_start"), "n_clips"
        )
    )


def stream_stream_block_join(
    clips: DataFrame,
    watermark: str = "10 minutes",
    join_window: str = "10 minutes",
) -> DataFrame:
    """Stateful stream–stream self-join on blocking key: candidate pairs
    between clips arriving within ``join_window`` of each other (Spark
    buffers both sides in the state store and evicts by watermark).

    The time-bound condition is what makes the state finite — the batch
    engine's unbounded block self-join becomes a windowed one; pairs that
    span more than the window are handled by the state-store clustering
    path (engine.py) instead."""
    base = clips.select(
        F.col("clip_id"),
        F.col("source"),
        F.col("event_time"),
        music_blocking_label(F.col("transcript"), 4).alias("blocking_key"),
        F.col("transcript"),
    ).withWatermark("event_time", watermark)
    left = base.alias("l")
    right = (
        base.withColumnRenamed("clip_id", "r_clip_id")
        .withColumnRenamed("source", "r_source")
        .withColumnRenamed("event_time", "r_event_time")
        .withColumnRenamed("transcript", "r_transcript")
        .alias("r")
    )
    return left.join(
        right,
        F.expr(
            f"""
            l.blocking_key = r.blocking_key AND
            clip_id < r_clip_id AND
            source != r_source AND
            r_event_time BETWEEN event_time - interval {join_window}
                             AND event_time + interval {join_window}
            """
        ),
    ).select(
        F.col("clip_id").alias("src_clip_id"),
        F.col("r_clip_id").alias("dst_clip_id"),
        F.col("l.blocking_key"),
        F.col("event_time"),
    )
