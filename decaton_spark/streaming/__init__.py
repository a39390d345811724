from decaton_spark.streaming.subscription import Subscription
from decaton_spark.streaming.stateful import streaming_compact

__all__ = ["Subscription", "streaming_compact"]
