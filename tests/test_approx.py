"""Sketch-based approximate aggregates — the documented scale path for
unbounded groups (exact forms are the oracle-gated queries; these pin
the accuracy contract of the swaps named in the docstrings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from decaton_spark.sources import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """HyperLogLog++ distinct counts within the configured 2% rsd of
    exact — the partial-aggregable swap for countDistinct at scale."""
    li = load_table(spark, "lineitem", sf_dir)
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.06 * row["exact"]


def test_percentile_approx_vs_exact(spark, sf_dir):
    """t-digest median within 1% of the exact interpolated percentile —
    the partial-aggregable swap docs_length_quantiles documents for
    unbounded groups."""
    docs = load_table(spark, "documents", sf_dir)
    row = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("exact"),
        F.percentile_approx("n_chars", 0.5, 10_000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(0.01 * row["exact"], 1.0)


def test_approx_aggs_partial_aggregate(spark, sf_dir):
    """Both sketches must partial-aggregate map-side (that is the whole
    point of the swap — the exact forms carry values to the reducer)."""
    li = load_table(spark, "lineitem", sf_dir)
    plan = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("d"),
            F.percentile_approx("l_quantity", 0.5, 1000).alias("m"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("HashAggregate") >= 2
