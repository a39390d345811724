"""Declarative data-quality expectations — evaluate a rule battery in
ONE scan, split pass/quarantine, and report per-rule violation counts.

The pipeline-gate pattern (Delta Live Tables expectations, Great
Expectations checkpoints): every ingested batch declares row-level
invariants ("value non-negative", "type in vocabulary", "timestamp
present"); rows violating any rule are quarantined WITH the list of
rules they broke (so triage never re-derives the reason), and the
per-rule counts feed monitoring.

NULL semantics are strict: a rule whose predicate evaluates to NULL on
a row (SQL three-valued logic) counts as a VIOLATION — an expectation
must affirmatively hold, unknowable is not a pass. This matches the
quality-filter convention in ``functions/quality.py`` (null documents
never land in 'keep').

100 TB shape: the violation array is a narrow projection fused into
the scan (no shuffle, no Python); pass/quarantine are two filters over
the same one-pass result, and the stats aggregate is a partial-agg
groupBy over |rules| exploded names — shuffle volume is rule-count
rows per partition, never data rows.

Reference parity: the reference's analog is the invalid-task discard
path (F2, ``decaton_spark/operators/filters.discard_invalid``) — a
single hard-coded rule; this generalizes it to a user-declared battery
with observability (SURVEY §7.1 beyond-reference surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_violations(
    df: DataFrame, rules: dict[str, Column], out_col: str = "violations"
) -> DataFrame:
    """Append ``out_col``: array of the rule names this row violates
    (empty array = clean row). One fused projection; rules evaluate
    left-to-right in dict order inside a single codegen stage."""
    checks = [
        F.when(cond, F.lit(None).cast("string")).otherwise(F.lit(name))
        for name, cond in rules.items()
    ]
    arr = F.filter(F.array(*checks), lambda x: x.isNotNull())
    return df.withColumn(out_col, arr)


def apply_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(passed, quarantined, stats): clean rows without the helper
    column, violating rows carrying their ``violations`` list, and a
    per-rule (rule, n_violations) frame for monitoring sinks.

    The two row outputs share one evaluated projection; stats explode
    only the violation names (bounded by |rules| per row)."""
    tagged = with_violations(df, rules)
    passed = tagged.filter(F.size("violations") == 0).drop("violations")
    quarantined = tagged.filter(F.size("violations") > 0)
    stats = (
        tagged.select(F.explode("violations").alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return passed, quarantined, stats
