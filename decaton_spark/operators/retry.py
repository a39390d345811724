"""T3/S5 — retry queueing: re-produce failed tasks with backoff.

Reference semantics: ``ProcessingContext.retry()``
(``processor/.../ProcessingContext.java:140-150``) completes the current
task and re-produces it to ``<topic>-retry``
(``RetryConfig.java:38,71-78`` naming) with ``retry_count+1`` and
``scheduled_time_millis = now + backoff``
(``DecatonTaskRetryQueueingProcessor.java:61-112``). The retry topic is
consumed by the same subscription (S2) and gated on the scheduled time
(T4). Enabling retry intentionally breaks per-key ordering
(``SubscriptionBuilder.java:167-169``) — same caveat here.

Batch-deterministic form: a predicate marks failures; failed rows get
mutated metadata and the retry topic. In streaming the same transform
runs inside ``foreachBatch`` with a Kafka write (see
``decaton_spark.streaming.subscription``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RETRY_TOPIC_SUFFIX = "-retry"


def retry_tasks(
    df: DataFrame,
    failed: Column,
    *,
    backoff_millis: int = 100,
    now_millis: Column | int | None = None,
    max_retries: int | None = None,
) -> DataFrame:
    """Build the retry-topic records for rows matching ``failed``.

    ``now_millis`` defaults to the task's own ``meta_timestamp_millis``
    so batch replays are deterministic (the streaming path passes the
    microbatch wall clock). Rows already at ``max_retries`` are dropped
    (dead-lettered by the caller).
    """
    now = (
        F.lit(now_millis)
        if isinstance(now_millis, int)
        else (now_millis if now_millis is not None else F.col("meta_timestamp_millis"))
    )
    out = df.filter(failed)
    if max_retries is not None:
        out = out.filter(F.col("meta_retry_count") < max_retries)
    return (
        out.withColumn("meta_retry_count", F.col("meta_retry_count") + 1)
        .withColumn("meta_scheduled_time_millis", now + F.lit(backoff_millis))
        .withColumn("topic", F.concat(F.col("topic"), F.lit(RETRY_TOPIC_SUFFIX)))
    )


def split_retry(
    df: DataFrame, failed: Column, *, backoff_millis: int = 100
) -> tuple[DataFrame, DataFrame]:
    """(succeeded, to_retry) — the per-microbatch split the streaming
    sink writes to the origin sink and the retry topic respectively."""
    return df.filter(~failed), retry_tasks(df, failed, backoff_millis=backoff_millis)
