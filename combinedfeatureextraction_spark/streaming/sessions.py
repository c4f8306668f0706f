"""Structured-Streaming surface for the engine's windowed operators.

The reference is pure bounded batch (SURVEY.md §2.9 — no streaming ops
exist), but the engine's sessionization / windowed aggregates have natural
streaming duals, provided here so the same feature definitions run over a
stream with watermarked late-data handling:

 - ``streaming_session_agg``: gap-based sessions via ``F.session_window``
   (state-store backed, watermark-bounded) — the streaming dual of
   operators.sessionize.
 - ``streaming_rolling_agg``: sliding-window aggregates via ``F.window``.

Both take any streaming DataFrame (readStream source); tests drive them
with a file source + ``Trigger.AvailableNow`` so results are deterministic
and comparable to the batch operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_agg(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(key, session) aggregates over a gap-session window. Watermark
    bounds state: sessions older than ``watermark`` finalize and evict."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*keys, F.session_window(F.col(ts), gap).alias("session"))
        .agg(
            F.count("*").alias("session_len"),
            F.sum(value).alias("session_sum"),
            F.avg(value).alias("session_mean"),
        )
        .select(
            *keys,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "session_len",
            "session_sum",
            "session_mean",
        )
    )


def streaming_rolling_agg(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window mean/min/max — the streaming dual of
    with_rolling_stats (time-based frames instead of row frames)."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*keys, F.window(F.col(ts), window, slide).alias("w"))
        .agg(
            F.avg(value).alias("roll_mean"),
            F.min(value).alias("roll_min"),
            F.max(value).alias("roll_max"),
            F.count("*").alias("roll_n"),
        )
        .select(
            *keys,
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "roll_mean",
            "roll_min",
            "roll_max",
            "roll_n",
        )
    )
