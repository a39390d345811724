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


def test_kmv_merge_equals_whole_sketch(spark, sf_dir):
    """Mergeability, exactly: bottom-k over part sketches == the
    sketch of the whole table (the partial-aggregation contract that
    lets per-shard/per-day sketches combine without rescanning)."""
    from decaton_spark.functions import sketches as sk

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.col("user_id").cast("string").alias("user_id")
    )
    whole = sk.kmv_sketch(ev, "user_id", ["event_type"], k=8)
    part_a = sk.kmv_sketch(
        ev.filter(F.col("user_id").cast("long") % 2 == 0),
        "user_id", ["event_type"], k=8,
    )
    part_b = sk.kmv_sketch(
        ev.filter(F.col("user_id").cast("long") % 2 == 1),
        "user_id", ["event_type"], k=8,
    )
    merged = sk.kmv_merge(part_a.unionByName(part_b), "user_id", ["event_type"], k=8)
    key = lambda df: sorted(
        (r["event_type"], r["rn"], r["h"]) for r in df.collect()
    )
    assert key(merged) == key(whole)


def test_kmv_estimator_accuracy(spark):
    """(k-1)/u_k within ~4/sqrt(k) of exact on a 5000-distinct column
    (well past the exact-path cutoff)."""
    from decaton_spark.functions import sketches as sk

    k = 64
    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = sk.kmv_distinct_estimate(
        sk.kmv_sketch(df, "v", ["g"], k=k), ["g"], k=k
    ).collect()[0]
    assert est["n_in_sketch"] == k
    assert abs(est["kmv_distinct_est"] - 5000) <= 4 / (k ** 0.5) * 5000


def test_kmv_small_group_exact_path(spark):
    from decaton_spark.functions import sketches as sk

    df = spark.range(10).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = sk.kmv_distinct_estimate(
        sk.kmv_sketch(df, "v", ["g"], k=32), ["g"], k=32
    ).collect()[0]
    assert est["kmv_distinct_est"] == 10 == est["n_in_sketch"]


def test_kmv_null_values_ignored(spark):
    """COUNT DISTINCT semantics: NULL is not a value. (Also a
    cross-engine trap — a NULL hash would sort first in Spark's
    bottom-k window but last in DuckDB's.)"""
    from decaton_spark.functions import sketches as sk

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b"), ("g", None)],
        "g string, v string",
    )
    est = sk.kmv_distinct_estimate(
        sk.kmv_sketch(df, "v", ["g"], k=8), ["g"], k=8
    ).collect()[0]
    assert (est["n_in_sketch"], est["kmv_distinct_est"]) == (2, 2)


def test_histogram_sketch_quantile_error_bounded(spark):
    """On a uniform ramp the histogram readout lands within one bucket
    width of the true quantile, and the readout is the bucket's lower
    edge (monotone in q)."""
    from decaton_spark.functions import sketches as sk

    rows = [("a", i / 100.0) for i in range(6400)]  # v2 = 0..6399
    df = spark.createDataFrame(rows, schema="event_type string, value double")
    out = sk.histogram_sketch_quantiles(df).collect()[0]
    width = 6400 // 64  # centi-units per bucket
    assert out["n"] == 6400
    for q in (50, 90, 99):
        true_centi = 6400 * q // 100
        est = out[f"p{q}_centi"]
        assert abs(est - true_centi) <= width, (q, est, true_centi)
    assert out["p50_centi"] <= out["p90_centi"] <= out["p99_centi"]
