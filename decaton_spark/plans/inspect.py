"""Physical-plan inspection — the engine's "is this the plan I want"
feedback loop (what you'd eyeball with ``.explain("formatted")``,
queryable programmatically so tests and tuning scripts can assert it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The explain string without stdout capture games."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of hash-partitioning exchanges in the plan — the metric to
    minimize for scale. (AQE may later coalesce them but cannot remove
    a logically-required shuffle.)

    Uses simple-mode explain: formatted mode prints Exchange arguments
    on separate detail lines, which makes substring counting lie.
    """
    return plan_of(df, "simple").count("Exchange hashpartitioning")


def uses_broadcast_join(df: DataFrame) -> bool:
    p = plan_of(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter predicates that reached the parquet scan."""
    out = []
    for line in plan_of(df).splitlines():
        if "PushedFilters:" in line:
            out.append(line.split("PushedFilters:", 1)[1].strip())
    return out
