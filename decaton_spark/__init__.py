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

from decaton_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
