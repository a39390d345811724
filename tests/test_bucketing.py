"""Bucketed co-located join: the persisted-shuffle scale path."""

from __future__ import annotations

import pytest

from decaton_spark.plans import (
    bucketize,
    colocated_join,
    count_shuffles,
    plan_of,
)
from decaton_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored); dropped on teardown
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    bucketize(
        li.withColumnRenamed("l_orderkey", "orderkey"),
        "li_bucketed",
        ["orderkey"],
        num_buckets=8,
        sort_cols=["orderkey"],
    )
    bucketize(
        o.withColumnRenamed("o_orderkey", "orderkey"),
        "o_bucketed",
        ["orderkey"],
        num_buckets=8,
        sort_cols=["orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_colocated_join_no_shuffle(spark, bucketed):
    joined = colocated_join(spark, "li_bucketed", "o_bucketed", ["orderkey"])
    assert count_shuffles(joined) == 0, plan_of(joined)
    # sorted buckets also remove the sort-merge sort
    assert joined.count() > 0


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, "lineitem", sf_dir).withColumnRenamed(
            "l_orderkey", "orderkey"
        )
        o = load_table(spark, "orders", sf_dir).withColumnRenamed(
            "o_orderkey", "orderkey"
        )
        joined = li.join(o, "orderkey")
        assert count_shuffles(joined) >= 2, "control: plain join shuffles both sides"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_bucketed_agg_no_shuffle(spark, bucketed):
    from pyspark.sql import functions as F

    agg = spark.table("li_bucketed").groupBy("orderkey").agg(F.sum("l_quantity"))
    assert count_shuffles(agg) == 0, "bucketing must satisfy the agg partitioning"
