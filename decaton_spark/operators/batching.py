"""T2 — task batching: size+time microbatching of tasks per key.

Reference semantics (``processor/.../processors/BatchingProcessor.java:126-163``,
``docs/task-batching.adoc``): buffer tasks into a list, flush when
``capacity`` is reached or every ``lingerMillis``, hand the batch to
user code.

Spark-first form: in streaming, Structured Streaming's trigger IS the
linger timer and ``foreachBatch`` receives the batch; the deterministic
batch semantics (what the oracle checks) assigns every task a
``(key, linger window, batch_seq)`` identity where ``batch_seq`` is the
0-based ordinal of ``capacity``-sized groups in arrival order
(partition, offset). This is a window-function sort per key — inherent
to ordered batching — but the sort key is (key, window), so it shuffles
once and sorts within groups only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def batch_tasks(
    df: DataFrame,
    *,
    capacity: int = 10,
    linger: str = "1 hour",
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "timestamp",
    order_cols: Sequence[str] = ("offset",),
) -> DataFrame:
    """Assign each task its batch identity: adds ``linger_window_start``
    (epoch millis), ``batch_seq`` and ``batch_pos`` columns."""
    win = F.window(F.col(ts_col), linger)
    df = df.withColumn("linger_window_start", F.unix_millis(win.start))
    w = Window.partitionBy(*key_cols, "linger_window_start").orderBy(
        *[F.col(c) for c in order_cols]
    )
    pos = F.row_number().over(w) - F.lit(1)
    return df.withColumn("batch_pos", pos % capacity).withColumn(
        "batch_seq", F.floor(pos / capacity)
    )


def batch_stats(
    df: DataFrame,
    *,
    capacity: int = 10,
    linger: str = "1 hour",
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "timestamp",
    order_cols: Sequence[str] = ("offset",),
) -> DataFrame:
    """One row per flushed batch: size and offset span — the shape a
    ``processBatchingTasks(List)`` callback observes."""
    assigned = batch_tasks(
        df,
        capacity=capacity,
        linger=linger,
        key_cols=key_cols,
        ts_col=ts_col,
        order_cols=order_cols,
    )
    first_order = order_cols[0]
    return assigned.groupBy(*key_cols, "linger_window_start", "batch_seq").agg(
        F.count(F.lit(1)).alias("batch_size"),
        F.min(first_order).alias("first_offset"),
        F.max(first_order).alias("last_offset"),
    )
