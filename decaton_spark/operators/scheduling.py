"""T4 — delayed/scheduled execution: gate tasks on scheduled_time.

Reference semantics (``ExecutionScheduler.waitOnScheduledTime()``,
``processor/.../runtime/internal/ExecutionScheduler.java:55-90``): a
task with ``scheduled_time_millis`` in the future blocks its
sub-partition queue until due.

Spark-first form: never block — split the batch into (due, pending).
Pending rows are carried to the next trigger (streaming: state-store
timer or re-scan; batch: the caller's loop). This removes Decaton's
head-of-line blocking, a strict improvement documented in SURVEY §7.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHED = "meta_scheduled_time_millis"


def due_filter(as_of_millis: Column | int) -> Column:
    as_of = F.lit(as_of_millis) if isinstance(as_of_millis, int) else as_of_millis
    c = F.col(SCHED)
    return c.isNull() | (c <= as_of)


def split_due(df: DataFrame, as_of_millis: Column | int) -> tuple[DataFrame, DataFrame]:
    """(due, pending) at the given processing time."""
    cond = due_filter(as_of_millis)
    return df.filter(cond), df.filter(~cond)
