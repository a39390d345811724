from decaton_spark.streaming.subscription import Subscription
from decaton_spark.streaming.event_time import event_time_compact
from decaton_spark.streaming.stateful import (
    ordered_process,
    streaming_batch,
    streaming_compact,
    streaming_dedup,
    streaming_heavy_hitters,
    streaming_kmv,
    streaming_lsh_candidates,
    streaming_quota,
    streaming_scheduled,
    streaming_zscore_alerts,
)

__all__ = [
    "Subscription",
    "event_time_compact",
    "ordered_process",
    "streaming_batch",
    "streaming_compact",
    "streaming_dedup",
    "streaming_heavy_hitters",
    "streaming_kmv",
    "streaming_lsh_candidates",
    "streaming_quota",
    "streaming_scheduled",
    "streaming_zscore_alerts",
]
