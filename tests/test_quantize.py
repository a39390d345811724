"""SQ8 scalar quantization: code bounds, exact reconstruction error
contract, recall harness sanity (functions/quantize.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from decaton_spark.functions import quantize as qt
from decaton_spark.sources import load_table


def test_sq_codes_bounded_and_extremes(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    stats = qt.sq_stats(emb)
    enc = qt.sq_encode(emb, stats)
    row = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).first()
    assert row["lo"] == 0, "some dimension's minimum must map to code 0"
    assert row["hi"] == qt.LEVELS, "some dimension's maximum must map to code 255"


def test_sq_reconstruction_error_within_one_level(spark, sf_dir):
    """|dequantized - original| ≤ one quantization level per dimension
    (level width = range/255), plus the 1e-4 integer-unit truncation."""
    emb = load_table(spark, "embeddings", sf_dir)
    stats = qt.sq_stats(emb)
    enc = qt.sq_encode(emb, stats).crossJoin(F.broadcast(stats))
    err = enc.select(
        F.posexplode("deq4").alias("i0", "d4"),
        F.col("embedding"),
        F.col("min7"),
        F.col("max7"),
    ).select(
        (
            F.abs(
                F.col("d4").cast("double") / 1e4
                - F.col("embedding")[F.col("i0")].cast("double")
            )
            - (
                (
                    F.element_at("max7", F.col("i0") + 1)
                    - F.element_at("min7", F.col("i0") + 1)
                ).cast("double")
                / (255.0 * 1e7)
            )
        ).alias("excess")
    )
    worst = err.agg(F.max("excess")).first()[0]
    # allow the 1e-4 dequantization grid + 1e-7 coordinate rounding
    assert worst <= 1.01e-4 + 1e-7, worst


def test_sq_topk_agrees_reasonably_with_exact(spark, sf_dir):
    """The recall harness itself: 8 query rows, recall in [0, 100], and
    SQ8 at 64 dims should not fall below 40% mean recall@5 (it is a
    4-bit-per-axis-of-range code, not a hash)."""
    from decaton_spark.queries import EXTRA_QUERIES, QUERIES

    spec = {**QUERIES, **EXTRA_QUERIES}["emb_sq_recall"]
    pdf = spec.fn(spark, sf_dir).toPandas()
    assert len(pdf) == 8
    assert pdf["recall_pct"].between(0, 100).all()
    assert pdf["recall_pct"].mean() >= 40.0


def test_binary_signature_bits_and_hamming(spark):
    """Known sign patterns pack to known words; Hamming ranks by bit
    disagreement; self excluded."""
    pos, neg = 0.5, -0.5
    rows = [
        (0, [pos] * 64),                  # all ones: h1 = h2 = 2^32 - 1
        (1, [pos] * 64),                  # identical -> hamming 0
        (2, [pos] * 32 + [neg] * 32),     # upper half flipped -> 32
        (3, [neg] * 64),                  # all flipped -> 64
        (4, [0.0] * 64),                  # zeros are NOT positive -> 64
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    sig = {r["vec_id"]: (r["h1"], r["h2"]) for r in qt.binary_signature(df).collect()}
    assert sig[0] == (2**32 - 1, 2**32 - 1)
    assert sig[2] == (2**32 - 1, 0)
    assert sig[3] == (0, 0) == sig[4]

    out = qt.hamming_topk(df, df.filter(F.col("vec_id") == 0), k=4).collect()
    got = {r["neighbor_id"]: r["hamming"] for r in out}
    assert got == {1: 0, 2: 32, 3: 64, 4: 64}
    ranks = {r["rank"]: r["neighbor_id"] for r in out}
    assert ranks[1] == 1 and ranks[2] == 2
    assert ranks[3] == 3 and ranks[4] == 4  # 64-tie -> lowest id first


def test_sq_refine_recall_beats_raw_sq(spark, sf_dir):
    """The refine stage can only help: exact re-rank of the SQ top-20
    must recall at least as many true top-5 neighbors as the raw SQ
    top-5 (and, on this corpus, strictly dominate 80%)."""
    from decaton_spark.queries import EXTRA_QUERIES, QUERIES

    ALL = {**QUERIES, **EXTRA_QUERIES}
    refined = ALL["emb_sq_refine_topk"].fn(spark, sf_dir).toPandas()
    raw_recall = ALL["emb_sq_recall"].fn(spark, sf_dir).toPandas()
    from decaton_spark.functions import similarity as sim
    from decaton_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 8)
    exact = sim.brute_force_topk(emb, q, k=5).toPandas()
    ex = set(zip(exact.query_id, exact.neighbor_id))
    rf = set(zip(refined.query_id, refined.neighbor_id))
    refined_recall = 100.0 * len(ex & rf) / len(ex)
    assert refined_recall >= raw_recall["recall_pct"].mean()
    assert refined_recall >= 80.0


def test_ndcg_quality_orders_by_compression(spark, sf_dir):
    """The eval harness must rank the rungs sensibly on average:
    exact ≥ SQ8, and every nDCG lies in [0, 1]."""
    from decaton_spark.queries import EXTRA_QUERIES, QUERIES

    pdf = (
        {**QUERIES, **EXTRA_QUERIES}["retrieval_ndcg_eval"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    assert set(pdf["method"]) == {"exact", "sq8", "binary"}
    assert pdf["ndcg"].between(0, 1).all()
    by = pdf.groupby("method")["ndcg"].mean()
    assert by["exact"] >= by["sq8"] - 1e-9


def test_adc_table_matches_per_pair_fold(spark, sf_dir):
    """Round-8 ADC rewrite pin: the per-query lookup-table dot
    (_adc_table_sql + _adc_dot_sql) must be IEEE-bit-identical to the
    old per-pair aggregate/zip_with fold for every (query, candidate)
    pair — the inner fold text is unchanged, only WHERE it evaluates
    moved (query row instead of pair row), so any divergence means the
    factoring broke the accumulation order."""
    from decaton_spark.functions import similarity as sim

    emb = load_table(spark, "embeddings", sf_dir)
    books = sim.train_pq_codebooks(
        emb, dataset=f"{sf_dir}/embeddings", m=8, ksub=16, iters=2
    )
    m, dsub = 8, 8
    enc = sim.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    ).selectExpr("*", f"{sim._adc_table_sql(books)} AS q_tab")
    pairs = enc.crossJoin(F.broadcast(q))
    old = "0.0D"
    for j in range(m):
        cv = (
            f"element_at({sim._pq_book_sql(books[j])}, "
            f"element_at(pq_codes, {j + 1}) + 1)"
        )
        old = (
            f"({old} + aggregate(zip_with("
            f"slice(q_vec, {j * dsub + 1}, {dsub}), {cv}, "
            "(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x))"
        )
    out = pairs.selectExpr(
        f"{old} AS fold_dot", f"{sim._adc_dot_sql(m)} AS table_dot"
    )
    assert out.filter("NOT (fold_dot <=> table_dot)").count() == 0


def test_sq_topk_vectorized_bit_identical(spark, sf_dir):
    """The int64-matmul scale path must reproduce the expression form
    EXACTLY — integer scores, ranks, ties — on the full fixture, at
    every k a registered consumer uses (5 = emb_sq_topk/recall,
    10 = retrieval_ndcg_eval, 20 = emb_sq_refine_topk)."""
    from decaton_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 8)
    for k in (5, 10, 20):
        a = sorted(map(tuple, qt.sq_topk(emb, q, k=k).collect()))
        b = sorted(map(tuple, qt.sq_topk_vectorized(emb, q, k=k).collect()))
        assert a == b, f"k={k}"


def test_brute_force_topk_vectorized_bit_identical(spark, sf_dir):
    """emb_sq_recall's exact tower (round 9) runs the BLAS-matmul
    brute-force path; it must reproduce the expression form EXACTLY at
    the recall query shape (k=5, vec_id < 8) — ranks, ties, and the
    rounded cosines (continuous scores: exact 5-decimal halves are
    measure-zero, the established tfidf/ANN rounding argument, and this
    pin would catch one if the fixture ever produced it)."""
    from decaton_spark.functions import similarity as sim
    from decaton_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 8)
    for k in (5, 10):  # 5 = emb_sq_recall, 10 = retrieval_ndcg_eval
        a = sorted(map(tuple, sim.brute_force_topk(emb, q, k=k).collect()))
        b = sorted(
            map(tuple, sim.brute_force_topk_vectorized(emb, q, k=k).collect())
        )
        assert a == b, f"k={k}"
