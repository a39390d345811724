"""T1 — task compaction: windowed per-key last-wins dedup.

Reference semantics (``processor/.../processors/CompactionProcessor.java:184-227``,
``docs/task-compaction.adoc``): hold at most one task per key inside a
linger window; when another task with the same key arrives, a user
compactor picks the survivor; the loser is completed without
processing; the survivor flushes downstream when the window closes.

Spark-first form: an aggregation, not a stateful loop. Per
``(key, tumbling linger window)`` the survivor is ``max_by(row,
order_key)`` — a single shuffle with map-side partial aggregation, so
it scales linearly and never materializes more than one candidate row
per key per partition on the map side. (A ``row_number`` window
function would sort every row; ``max_by`` is the plan you want at
100 TB.)

The default ordering matches the reference's example compactor (keep
the largest task timestamp, ``docs/task-compaction.adoc`` /
``LocationEvent``), tie-broken by offset for determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact_tasks(
    df: DataFrame,
    *,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "timestamp",
    linger: str | None = "1 hour",
    order_by: Sequence[str | Column] = ("meta_timestamp_millis", "offset"),
    keep_window: bool = False,
) -> DataFrame:
    """Return the survivor row per (key, linger window).

    ``order_by`` is the compactor: the row maximal under the
    lexicographic struct ordering survives (PICK_LEFT/PICK_RIGHT in the
    reference collapses to this for any total order; EITHER is made
    deterministic by the offset tie-break callers should include).
    ``linger=None`` compacts globally per key (one survivor per key).
    """
    out_cols = list(df.columns)
    order_struct = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    survivor = F.max_by(F.struct(*out_cols), order_struct).alias("survivor")

    group: list[Column] = [F.col(c) for c in key_cols]
    if linger is not None:
        group.append(F.window(F.col(ts_col), linger).alias("linger_window"))

    agg = df.groupBy(*group).agg(survivor)
    cols = [F.col(f"survivor.{c}").alias(c) for c in out_cols]
    if keep_window and linger is not None:
        cols.append(F.col("linger_window"))
    return agg.select(*cols)


def compact_tasks_hash(
    df: DataFrame,
    *,
    key_cols: Sequence[str] = ("key",),
    ts_col: str = "timestamp",
    linger: str | None = "1 hour",
    order_ts: str = "meta_timestamp_millis",
    order_offset: str = "offset",
) -> DataFrame:
    """Sort-free compaction: the HashAggregate alternative to
    ``compact_tasks``.

    ``max_by(struct, struct)`` carries the payload in its aggregation
    buffer, and struct/string buffers force SortAggregate (per-partition
    sorts on both sides of the exchange). This variant aggregates ONLY a
    packed fixed-width DECIMAL — ``ts * 2^62 + offset`` (offset < 2^62:
    a Kafka offset always is; DECIMAL(38,0) holds 2^41-ms timestamps ×
    2^62 with room to spare) — which IS hash-aggregable, then one
    equi-join on (group, packed) recovers the survivor row. The trade:
    an extra join (broadcast-able: one row per group) for zero sorts —
    worth it when compaction input is too wide or too big to sort-spill
    gracefully; same survivors bit-for-bit (both orderings are the
    lexicographic (ts, offset) max, offsets unique).
    """
    two62 = F.lit(2**62).cast("decimal(38,0)")
    packed = (
        F.col(order_ts).cast("decimal(38,0)") * two62
        + F.col(order_offset).cast("decimal(38,0)")
    ).alias("_packed")

    group_names = list(key_cols)
    base = df.withColumn("_packed", packed)
    if linger is not None:
        base = base.withColumn(
            "_lw", F.window(F.col(ts_col), linger)["start"]
        )
        group_names.append("_lw")

    winners = base.groupBy(*group_names).agg(F.max("_packed").alias("_packed"))
    out = base.join(winners, [*group_names, "_packed"])
    return out.select(*df.columns)
