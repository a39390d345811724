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
    if out_col in df.columns:
        raise ValueError(
            f"with_violations: column {out_col!r} already exists on the "
            "input frame; pass a different out_col"
        )
    checks = [
        F.when(cond, F.lit(None).cast("string")).otherwise(F.lit(name))
        for name, cond in rules.items()
    ]
    arr = F.filter(F.array(*checks), lambda x: x.isNotNull())
    return df.withColumn(out_col, arr)


def apply_expectations(
    df: DataFrame, rules: dict[str, Column], out_col: str = "violations"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(passed, quarantined, stats): clean rows without the helper
    column, violating rows carrying their ``out_col`` list, and a
    per-rule (rule, n_violations) frame for monitoring sinks — one row
    per DECLARED rule (count 0 when nothing violates it), so the
    monitoring schema is stable regardless of the data.

    The two row outputs share one evaluated projection; stats explode
    only the violation names (bounded by |rules| per row)."""
    tagged = with_violations(df, rules, out_col=out_col)
    passed = tagged.filter(F.size(out_col) == 0).drop(out_col)
    quarantined = tagged.filter(F.size(out_col) > 0)
    counts = (
        tagged.select(F.explode(out_col).alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    names = df.sparkSession.createDataFrame(
        [(n,) for n in rules], schema="rule string"
    )
    stats = names.join(counts, "rule", "left").select(
        "rule",
        F.coalesce("n_violations", F.lit(0)).cast("long").alias("n_violations"),
    )
    return passed, quarantined, stats
