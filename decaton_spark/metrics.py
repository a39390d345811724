"""Metrics — the engine's analog of Decaton's Micrometer meters.

Reference exposes ~25 meters (``tasks.processed``, ``tasks.discarded``,
``tasks.process.duration``, ``partition.paused``, ``retry.queued.tasks``
— ``processor/.../metrics/Metrics.java:129-352``; ``docs/monitoring.adoc``).

Spark-native mapping:
- per-batch dataflow counters → ``DataFrame.observe`` (computed inside
  the job, no extra pass over the data);
- query-level rates/latency → ``StreamingQueryListener`` progress events
  (``processedRowsPerSecond``, batch durations), the analog of
  Decaton's subscription-level meters and state listener
  (``SubscriptionStateListener``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "decaton_metrics"


def observe_tasks(df: DataFrame, name: str = OBSERVATION_NAME) -> DataFrame:
    """Attach Decaton-style counters to a task DataFrame; metrics are
    reported per action (batch) / per microbatch (streaming) in
    ``observedMetrics[name]``."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("tasks_processed"),
        F.sum(F.col("meta_retry_count")).alias("retry_count_total"),
        F.max("meta_timestamp_millis").alias("max_task_ts_ms"),
    )


@dataclass
class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress — tasks.processed / duration meters.

    Attach with ``spark.streams.addListener(listener)``.
    """

    progress: list[dict] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
        }
        obs = p.observedMetrics or {}
        if OBSERVATION_NAME in obs:
            row = obs[OBSERVATION_NAME]
            rec["observed"] = row.asDict()
        self.progress.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> MetricsListener:
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener
