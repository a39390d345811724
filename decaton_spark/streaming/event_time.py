"""Event-time windowed operators with watermark-based late-data policy.

The reference is processing-time only: compaction/batching linger
windows are wall-clock timers and there is no late-data story
(SURVEY §2.6 — ``CompactionProcessor.java:179-181``). Spark's
event-time watermarking is the native upgrade: windows are keyed by
the *task* timestamp, late rows beyond the watermark are dropped
deterministically, and append-mode emits each (key, window) exactly
once when the watermark passes the window end — i.e. the streaming
result converges to the batch ``compact_tasks`` output over the
non-late rows.

Scale: identical plan to the batch aggregation (hash partial agg →
shuffle on (key, window) → final agg) plus per-window state in the
checkpointed state store; state size is O(open windows × keys), and
the watermark bounds "open".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_time_compact(
    stream: DataFrame,
    *,
    linger: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "timestamp",
    key_col: str = "key",
) -> DataFrame:
    """Event-time T1 compaction: last-wins survivor per (key, tumbling
    linger window) with late rows beyond the watermark dropped.

    Output: key, window_start_ms, offset, meta_timestamp_millis, value
    — one row per closed (key, window) in append mode.
    """
    survivor = F.max_by(
        F.struct("offset", "meta_timestamp_millis", "value"),
        F.struct("meta_timestamp_millis", "offset"),
    ).alias("survivor")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.window(F.col(ts_col), linger).alias("linger_window"),
        )
        .agg(survivor)
        .select(
            key_col,
            F.unix_millis("linger_window.start").alias("window_start_ms"),
            F.col("survivor.offset").alias("offset"),
            F.col("survivor.meta_timestamp_millis").alias("meta_timestamp_millis"),
            F.col("survivor.value").alias("value"),
        )
    )
