"""Unit tests for DSIR-style domain importance (functions/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from decaton_spark.functions.dsir import domain_importance


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    out = domain_importance(df, F.col("dom") == "t", **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_target_like_documents_score_higher(spark):
    rows = [
        (1, "alpha alpha beta", "t"),
        (2, "alpha beta beta", "t"),
        (3, "gamma gamma delta", "b"),
        (4, "alpha alpha alpha", "b"),  # background doc, target-like text
        (5, "gamma delta delta", "b"),
    ]
    out = _run(spark, rows)
    # documents made of target-domain tokens outrank background-token docs
    target_like = [out[1], out[2], out[4]]
    background_like = [out[3 if False else 3], out[5]]
    assert min(r["importance"] for r in target_like) > max(
        r["importance"] for r in background_like
    )
    assert all(out[i]["n_scored_tokens"] == 3 for i in out)


def test_empty_and_null_documents(spark):
    rows = [(1, "alpha beta", "t"), (2, "", "b"), (3, None, "b")]
    out = _run(spark, rows)
    assert len(out) == 3
    for i in (2, 3):
        assert out[i]["n_scored_tokens"] == 0
        assert out[i]["importance"] is None


def test_min_count_prunes_to_oov_ratio(spark):
    rows = [
        (1, "common common common common", "t"),
        (2, "common common common rare", "b"),
    ]
    # 'rare': cb=1, ct=0 -> in-vocab ratio (0+1)/(1+1)·K vs OOV 1/1·K —
    # pruning it to OOV changes doc 2 and leaves all-in-vocab doc 1 alone
    pruned = _run(spark, rows, min_count=2)
    kept = _run(spark, rows, min_count=1)
    assert pruned[1]["importance"] == kept[1]["importance"]
    assert pruned[2]["importance"] != kept[2]["importance"]


def test_partitioning_invariance(spark):
    """Results are identical regardless of input partitioning — no
    hidden order dependence in the scaled-integer aggregation."""
    rows = [
        (i, " ".join(["alpha", "beta", "gamma", "delta"][: (i % 4) + 1]), "t" if i % 3 == 0 else "b")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    a = domain_importance(df.repartition(1), F.col("dom") == "t").collect()
    b = domain_importance(df.repartition(16, "doc_id"), F.col("dom") == "t").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
