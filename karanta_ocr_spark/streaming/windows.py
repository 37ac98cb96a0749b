"""Event-time windowed aggregation + sessionization.

The reference tracks rolling rates with a 300 s MetricsKeeper window
(``karanta/pipeline.py:41,955-961``); Spark-native equivalents are
event-time tumbling windows (batch + streaming with watermark) and
gap-based sessionization. Both batch forms are plain Catalyst window/
group expressions, so a SQL oracle can verify them; the streaming
forms reuse the identical expressions behind a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Works on batch and
    streaming DataFrames alike; pass *watermark* (e.g. "2 hours") for
    streaming so late data is bounded and state can be evicted."""
    df = events
    if watermark is not None:
        # Watermarks need TIMESTAMP (not NTZ); with the engine's UTC
        # session timezone the cast preserves the wall clock.
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when a
    user's inter-event gap exceeds *gap_minutes*. Classic gaps-and-
    islands with two window functions — one shuffle on user_id, sorts
    bounded per user. Returns one row per session."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    # NTZ timestamps can't cast straight to long under ANSI; go via
    # TIMESTAMP (UTC session tz keeps the wall clock).
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    with_flag = events.withColumn(
        "_new",
        F.when(epoch - F.lag(epoch).over(w) > gap, 1).otherwise(0),
    )
    with_id = with_flag.withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .withColumn("session_seq", F.col("session_seq").cast("long"))
    )


def streaming_session_counts(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows via ``session_window`` (native state
    management — the engine merges/evicts session state under the
    watermark; ``applyInPandasWithState`` is only needed for logic
    session_window can't express)."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("w"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            user_col,
            "n_events",
        )
    )
