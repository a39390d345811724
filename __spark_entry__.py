"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`decaton_spark.queries`, the engine's query
registry (one entry per implemented operator from SURVEY.md §2 plus the
LLM-data-pipeline operators, each paired with DuckDB oracle SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from decaton_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
