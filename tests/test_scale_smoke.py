"""Scale smoke: the core operators at 5-10M rows (~80x the sf0.1
events volume), generated in-plan (spark.range — no driver data).

Correctness at this size is asserted structurally (exact group counts,
conservation) — the DuckDB oracle gate covers values at sf0.01; these
tests prove the plans EXECUTE at two orders of magnitude more rows on
the same memory, i.e. nothing in the operator shape is secretly
driver-bound or quadratic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_TASKS = 5_000_000
N_KEYS = 10_007


@pytest.fixture(scope="module")
def big_tasks(spark):
    df = (
        spark.range(N_TASKS)
        .select(
            (F.col("id") % N_KEYS).cast("string").alias("key"),
            F.col("id").alias("offset"),
            (
                F.lit(1_700_000_000_000) + (F.col("id") % 86_400_000)
            ).alias("meta_timestamp_millis"),
            (F.col("id") % 32).cast("int").alias("partition"),
            F.concat(
                F.lit('{"k": '), (F.col("id") % 100).cast("string"), F.lit("}")
            ).alias("value"),
            F.lit("bench").alias("topic"),
        )
        .withColumn(
            "timestamp", F.timestamp_millis(F.col("meta_timestamp_millis"))
        )
    )
    return df


def test_compaction_5m(big_tasks):
    """T1 global compaction at 5M rows: exactly one survivor per key,
    and the survivor is the max-(ts, offset) row."""
    from decaton_spark.operators.compaction import compact_tasks

    out = compact_tasks(big_tasks, linger=None)
    assert out.count() == N_KEYS
    mx = out.agg(F.max("offset").alias("m")).collect()[0]["m"]
    assert mx == N_TASKS - 1


def test_quota_split_5m(big_tasks):
    """T6 quota split at 5M rows: conservation and verdict sanity on
    the groupBy+join-back plan (no WindowExec sort of 5M rows)."""
    from decaton_spark.operators.quota import split_shaping

    process, shape = split_shaping(
        big_tasks, 400.0 / 86_400, window_duration="1 day"
    )
    n_p, n_s = process.count(), shape.count()
    assert n_p + n_s == N_TASKS
    # ~500 rows/key/day vs quota 400/day: every key ends up shaped
    assert n_s > 0


def test_span_dedup_200k_docs(spark):
    """Span dedup at 200k synthetic docs (400x the sf0.001 corpus) with
    a planted 10%% duplicate cohort: the election + join-back + restitch
    pipeline runs at corpus scale and removes exactly the planted
    duplicate spans (every 10th doc repeats doc 0's text)."""
    from decaton_spark.functions.dedup import span_dedup

    n = 200_000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0, F.lit("dup dup dup dup")
        ).otherwise(
            F.concat_ws(
                " ",
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
                F.md5((F.col("id") + 2).cast("string")),
            )
        ).alias("text"),
    )
    out = span_dedup(base, span_words=4)
    total = out.count()
    assert total == n
    kept = out.filter(F.col("n_spans_kept") > 0).count()
    # unique docs keep their span; of the 20k dup docs only doc 0 survives
    assert kept == n - n // 10 + 1
