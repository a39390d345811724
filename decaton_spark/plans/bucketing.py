"""Bucketing — pre-shuffled storage for repeat co-located joins/aggs.

At 100 TB the biggest recurring cost is re-shuffling the same fact
table on the same key for every join. Bucketed tables
(``DataFrameWriter.bucketBy``) persist the hash-partitioning in
storage: a join of two tables bucketed on the same key with the same
bucket count needs NO exchange at plan time — Spark reads buckets
pairwise. This module wraps that pattern for the engine's task/fact
tables (the analog of Decaton pinning a key to a sub-partition,
persisted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    *,
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally removes the sort from
    sort-merge joins and enables efficient per-key ordered scans
    (the batch analog of per-key ordered processing).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — zero exchanges when bucket specs
    match (assert with ``plans.count_shuffles``)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
