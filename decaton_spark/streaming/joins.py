"""Watermarked stream-stream joins.

The reference has no stream-join operator — correlating a retry task
with its origin, or a shaping-topic record with the triggering task,
is done by the user's processor against an external store. Structured
Streaming expresses it natively as a stream-stream equi-join with an
interval bound; the watermarks turn the unbounded join state into a
sliding buffer.

Scale notes: both inputs shuffle once on the join key; each side's
state store holds only rows inside ``watermark + within`` (Spark
derives the eviction bound from the time condition), so state is
O(rate × window), not O(stream). A skewed key skews the join state —
the same salting strategy as batch applies if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows whose right-side event time falls in
    ``[left_ts, left_ts + within]`` for equal keys.

    The canonical task-topology use: ``left`` = origin tasks,
    ``right`` = retry-topic tasks; the result pairs each retry with the
    origin attempt it follows, within the retry backoff horizon.
    Column names must be disjoint apart from the key columns (rename
    before joining — the helper refuses ambiguity rather than aliasing
    silently).

    ``how='leftOuter'`` additionally emits unmatched left rows once
    the watermark proves no match can arrive — e.g. "origin tasks that
    never retried" as a stream.
    """
    ts_overlap = {left_ts, right_ts} & ({left_key, right_key})
    if left_ts == right_ts or ts_overlap:
        raise ValueError("left/right timestamp columns must be distinct names")
    shared = (set(left.columns) & set(right.columns)) - (
        {left_key, right_key} if left_key == right_key else set()
    )
    if left_key == right_key:
        # disambiguate the key by renaming the right side
        right = right.withColumnRenamed(right_key, f"_r_{right_key}")
        right_key = f"_r_{right_key}"
        shared = (set(left.columns) & set(right.columns)) - {right_key}
    if shared:
        raise ValueError(f"ambiguous columns on both sides: {sorted(shared)}")
    l = left.withWatermark(left_ts, left_watermark) if left.isStreaming else left
    r = (
        right.withWatermark(right_ts, right_watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"interval {within}"))
    )
    return l.join(r, cond, how)
