"""Edge-case unit tests for the retrieval/scoring/heavy-hitter
operators added in round 3 (the oracle gate covers the fixture corpus;
these cover the degenerate inputs real corpora contain)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decaton_spark.functions.sketches import heavy_hitters
from decaton_spark.functions.text import bm25_search, lm_score
from decaton_spark.operators.timeseries import resample_gapfill


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "spark join window spark"),
            (1, "spark"),
            (2, "nothing relevant here"),
            (3, "join join join join join join"),
        ],
        "doc_id long, text string",
    )


def test_bm25_only_matching_docs_ranked(spark, tiny_docs):
    out = bm25_search(tiny_docs, ["spark", "join"], top_k=10).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {0, 1, 3}, "doc 2 matches no query term"
    assert all(r["score"] > 0 for r in out)
    # doc 0 hits both terms; docs 1 and 3 hit one each
    hits = {r["doc_id"]: r["n_terms_hit"] for r in out}
    assert hits[0] == 2 and hits[1] == 1 and hits[3] == 1
    # ranks are dense from 1 and ordered by score
    ranks = [r["rank"] for r in sorted(out, key=lambda r: -r["score"])]
    assert ranks == [1, 2, 3]


def test_bm25_term_absent_from_corpus(spark, tiny_docs):
    out = bm25_search(tiny_docs, ["zzz_not_in_corpus"], top_k=5).collect()
    assert out == [], "no doc contains the term"


def test_bm25_saturates_with_tf(spark, tiny_docs):
    """BM25's tf normalization must saturate: doc 3 (6x 'join') scores
    higher than a single occurrence but far below 6x."""
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_search(tiny_docs, ["join"], top_k=5).collect()
    }
    assert out[3] > out[0]
    assert out[3] < 6 * out[0]


def test_lm_score_boilerplate_scores_higher(spark):
    """Docs made of corpus-common tokens must outscore docs of
    corpus-rare tokens (the CCNet filtering signal)."""
    docs = spark.createDataFrame(
        [(i, "common common common") for i in range(9)] + [(9, "rare unique")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_logprob"] for r in lm_score(docs).collect()}
    assert out[0] > out[9]
    assert len(out) == 10


def test_lm_score_single_token_doc(spark):
    docs = spark.createDataFrame(
        [(0, "a"), (1, "a a a a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert out[0]["n_tokens"] == 1 and out[1]["n_tokens"] == 4
    # both docs contain only 'a' => logprob ln(5/5)=0 for both
    assert out[0]["avg_logprob"] == 0.0 == out[1]["avg_logprob"]


def test_heavy_hitters_threshold_extremes(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 10 + ["b"] * 3 + ["c"] * 1],
        "key string",
    )
    # threshold above the max count: empty
    assert heavy_hitters(df, "key", threshold=11).count() == 0
    # threshold 1: every key qualifies with its exact count
    all_keys = {
        (r["key"], r["cnt"])
        for r in heavy_hitters(df, "key", threshold=1).collect()
    }
    assert all_keys == {("a", 10), ("b", 3), ("c", 1)}
    # narrow sketch (heavy collisions) must not change the exact output
    narrow = {
        (r["key"], r["cnt"])
        for r in heavy_hitters(df, "key", threshold=3, width=2, depth=1).collect()
    }
    assert narrow == {("a", 10), ("b", 3)}


def test_resample_gapfill_fills_interior_gaps(spark):
    h = 3_600_000
    rows = [
        ("k1", 0 * h + 5, 10.0),
        ("k1", 3 * h + 5, 40.0),  # 2-bucket gap between
        ("k2", 1 * h, 7.0),  # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(
        rows, "key string, meta_timestamp_millis long, event_value double"
    )
    out = {
        (r["key"], r["bucket_ms"]): r
        for r in resample_gapfill(df).collect()
    }
    assert len(out) == 4 + 1, "k1 spans 4 buckets, k2 spans 1"
    # interior gap buckets exist with n_events=0 and LOCF value
    assert out[("k1", h)]["n_events"] == 0
    assert out[("k1", h)]["bucket_value"] is None
    assert out[("k1", h)]["filled_value"] == 10.0
    assert out[("k1", 2 * h)]["filled_value"] == 10.0
    assert out[("k1", 3 * h)]["filled_value"] == 40.0
    assert out[("k2", h)]["n_events"] == 1
    assert out[("k2", h)]["filled_value"] == 7.0


def test_score_sums_partition_invariant(spark, sf_dir):
    """The rounded-DECIMAL score sums in BM25 and LM scoring must be
    independent of partitioning / aggregation order (the reason they
    are DECIMAL and not float sums)."""
    from decaton_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    for fn in (
        lambda d: bm25_search(d, ["spark", "join", "window"], top_k=10),
        lm_score,
    ):
        a = {tuple(r) for r in fn(docs.repartition(1)).collect()}
        b = {tuple(r) for r in fn(docs.repartition(13)).collect()}
        assert a == b and a


def test_centroid_drift_partition_invariant(spark, sf_dir):
    """Scaled-integer centroid sums: bit-identical cosines at any
    partition count (the float-sum-order hazard this design removes)."""
    from decaton_spark.functions.similarity import centroid_drift
    from decaton_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    a = {tuple(r) for r in centroid_drift(emb.repartition(1)).collect()}
    b = {tuple(r) for r in centroid_drift(emb.repartition(17)).collect()}
    assert a == b and len(a) == 10


def test_hll_merge_equals_union(spark, sf_dir):
    """HLL mergeability: estimating the merged register tables of two
    disjoint shards equals estimating their union directly — the
    property that lets 100 TB shards sketch independently."""
    from decaton_spark.functions.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_merge,
        hll_register_table,
    )
    from decaton_spark.sources import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.col("user_id").cast("string").alias("user_id")
    )
    a = ev.filter(F.col("user_id").cast("long") % 2 == 0)
    b = ev.filter(F.col("user_id").cast("long") % 2 == 1)
    merged = hll_merge(
        hll_register_table(a, "user_id", ["event_type"]),
        hll_register_table(b, "user_id", ["event_type"]),
    )
    got = {
        (r["event_type"], r["hll_estimate"], r["n_registers"])
        for r in hll_estimate_from_registers(merged, ["event_type"]).collect()
    }
    want = {
        (r["event_type"], r["hll_estimate"], r["n_registers"])
        for r in hll_distinct(ev, "user_id", ["event_type"]).collect()
    }
    assert got == want and want
