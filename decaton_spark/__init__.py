"""decaton_spark — a PySpark-native task-stream analytics engine.

A from-scratch rebuild of the capabilities of line/decaton (a Kafka
task-processing framework) on Spark DataFrames / Structured Streaming,
plus the relational surface (Spark SQL) and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) the
reference's north star calls for.

Design stance (see SURVEY.md §7):
- Engine core is a thin layer over Structured Streaming; batch mode is
  first-class — every operator has a deterministic batch semantics over a
  static DataFrame, and streaming is the same operator on a streaming one.
- All hot-path logic is native Spark expressions (Catalyst/Tungsten);
  Python appears only at user-logic edges (pandas UDFs, foreachBatch).
"""

from decaton_spark._vendor import ensure_protobuf as _ensure_protobuf

# Make google.protobuf importable (vendored mini-runtime) when absent:
# unlocks transformWithStateInPandas' Python state-server clients. Must
# run before any SparkSession exists so workers inherit PYTHONPATH.
_ensure_protobuf()

from decaton_spark.session import get_spark  # noqa: E402
from decaton_spark.envelope import events_to_tasks
from decaton_spark.operators import (
    Pipeline,
    apply_key_quota,
    batch_tasks,
    compact_tasks,
    ignore_keys,
    rate_limit,
    retry_tasks,
    split_due,
    split_shaping,
    sub_partition,
)
from decaton_spark.operators.asof import asof_join
from decaton_spark.sources import load_table

__all__ = [
    "Pipeline",
    "apply_key_quota",
    "asof_join",
    "batch_tasks",
    "compact_tasks",
    "events_to_tasks",
    "get_spark",
    "ignore_keys",
    "load_table",
    "rate_limit",
    "retry_tasks",
    "split_due",
    "split_shaping",
    "sub_partition",
]
__version__ = "0.1.0"
