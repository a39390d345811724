from decaton_spark.streaming.subscription import Subscription
from decaton_spark.streaming.stateful import (
    ordered_process,
    streaming_compact,
    streaming_quota,
)

__all__ = ["Subscription", "ordered_process", "streaming_compact", "streaming_quota"]
