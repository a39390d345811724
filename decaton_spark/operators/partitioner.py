"""P1-P3 — sub-partitioning (Decaton's shuffle).

Reference: murmur2(key + salt) % concurrency routes each key to a
sub-partition, preserving per-key ordering
(``DefaultSubPartitioner.java:40-57``); null keys spread round-robin
(``RoundRobinSubPartitioner.java:40-43``); the strategy is pluggable
(``SubPartitioner.java``).

In Spark the real routing is HashPartitioning inside the shuffle —
these helpers expose the assignment as a column (for tests, skew
inspection, and quota bucketing) and perform the physical repartition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sub_partition(
    df: DataFrame,
    num_partitions: int,
    *,
    key_col: str = "key",
    method: str = "hash",
    expr: Column | None = None,
    out_col: str = "sub_partition",
) -> DataFrame:
    """Add the sub-partition assignment column.

    ``hash`` uses xxhash64 (Spark-native 64-bit hash; plays murmur2's
    role in the reference). ``round_robin`` spreads keyless records.
    ``custom`` routes by a caller expression (P3 plug point).
    """
    if method == "hash":
        assign = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_partitions))
    elif method == "round_robin":
        # Row-level rotation, matching the reference's monotonic
        # counter % bound (RoundRobinSubPartitioner.java:40-43):
        # monotonically_increasing_id is (partitionId << 33) + row
        # index, so consecutive rows of a partition cycle through all
        # num_partitions residues — no cross-partition coordination,
        # like the reference's per-consumer counter.
        assign = F.pmod(F.monotonically_increasing_id(), F.lit(num_partitions))
    elif method == "custom":
        if expr is None:
            raise ValueError("custom method requires expr")
        assign = F.pmod(expr, F.lit(num_partitions))
    else:
        raise ValueError(f"unknown method {method!r}")
    return df.withColumn(out_col, assign.cast("int"))


def repartition_by_key(df: DataFrame, num_partitions: int, key_col: str = "key") -> DataFrame:
    """Physical co-location of a key's rows (the actual shuffle)."""
    return df.repartition(num_partitions, F.col(key_col))
