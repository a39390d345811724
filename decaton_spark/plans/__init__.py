from decaton_spark.plans.inspect import (
    count_shuffles,
    plan_of,
    pushed_filters,
    uses_broadcast_join,
)
from decaton_spark.plans.bucketing import bucketize, colocated_join

__all__ = [
    "bucketize",
    "colocated_join",
    "count_shuffles",
    "plan_of",
    "pushed_filters",
    "uses_broadcast_join",
]
