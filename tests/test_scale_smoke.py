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


def test_domain_importance_500k_docs(spark):
    """DSIR scoring at 500k synthetic docs: the vocab groupBy, the
    broadcast ratio join, and the integer-mean aggregation execute at
    corpus scale; docs built from target-domain tokens outrank
    background docs."""
    from decaton_spark.functions.dsir import domain_importance

    n = 500_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5 == 0).alias("is_target_row"),
        F.when(
            F.col("id") % 5 == 0,
            F.lit("tgt alpha tgt beta tgt gamma"),
        )
        .otherwise(F.lit("bg one bg two bg three"))
        .alias("text"),
    )
    out = domain_importance(docs, F.col("is_target_row"), min_count=2)
    rows = out.filter(F.col("doc_id").isin(0, 1)).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert out.count() == n
    assert by_id[0]["importance"] > by_id[1]["importance"]


def test_semantic_dedup_200k_vectors(spark):
    """SemDeDup at 200k vectors (100x the sf0.1 embedding table):
    cell assignment stays a projection and the within-cell equi-join
    executes without an all-pairs blowup. Vectors are near-one-hot in
    dim (id % 8); a planted exact-duplicate cohort (id % 1000 == 1
    copies vector 1) collapses to its lowest id."""
    from decaton_spark.functions.similarity import semantic_dedup

    n = 200_000
    dims = 8
    # planted clones take vector-1's id as their content key, so they
    # are EXACTLY vec 1 (same one-hot dim, same jitter); everyone else
    # derives content from their own id
    content = F.when(F.col("id") % 1000 == 1, F.lit(1)).otherwise(F.col("id"))
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda d: F.when(
                d == (content % dims).cast("int"),
                1.0,
            ).otherwise(
                # small deterministic jitter so non-planted vectors in a
                # cell stay below the dup threshold
                (F.pmod(F.xxhash64(content, d), 1000).cast("double"))
                / 10_000.0
            ),
        ).alias("embedding"),
    )
    cents = [
        (c, [1.0 if d == c else 0.0 for d in range(dims)]) for c in range(dims)
    ]
    out = semantic_dedup(base, centroids=cents, eps=0.999)
    assert out.count() == n
    planted = out.filter(F.col("vec_id") % 1000 == 1)
    # vec 1 survives; every later clone (199 of them) collapses onto a
    # lower-id clone in the same cell
    assert planted.filter(~F.col("keep")).count() == n // 1000 - 1
    assert planted.filter(F.col("vec_id") == 1).collect()[0]["keep"]


def test_skew_join_5m(spark):
    """A 5M-row fact where one key holds 80% of rows, force-joined as
    sort-merge (no broadcast escape hatch): AQE's skew-join split must
    carry it to completion with exact row conservation — the runtime
    defense for key skew no static plan can predict."""
    n = 5_000_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 5 != 0, F.lit("HOT"))
        .otherwise((F.col("id") % N_KEYS).cast("string"))
        .alias("key"),
        F.col("id").alias("v"),
    )
    dim = (
        spark.range(N_KEYS)
        .select(F.col("id").cast("string").alias("key"),
                (F.col("id") * 2).alias("w"))
        .union(
            spark.createDataFrame([("HOT", -1)], "key string, w long")
        )
    )
    joined = fact.join(dim.hint("merge"), "key")
    assert joined.count() == n
    hot = joined.filter(F.col("key") == "HOT").count()
    assert hot == n - n // 5


def test_curation_pipeline_200k_docs(spark):
    """The five-stage curation composition at 200k synthetic docs:
    quality filter (drops planted short docs), exact dedup (collapses a
    planted 10% clone cohort), decontamination (drops docs sharing
    3-grams with a held-out eval slice), DSIR scoring, top-100
    selection — end-to-end at 400x fixture scale."""
    from decaton_spark.functions import dsir
    from decaton_spark.functions.dedup import exact_dups
    from decaton_spark.functions.quality import decontaminate, gopher_filter

    n = 200_000
    # 12-token docs from md5 material; every 10th doc clones doc 3's
    # text; every 1000th doc is a 2-token stub the filter must drop
    content = F.when(F.col("id") % 10 == 3, F.lit(3)).otherwise(F.col("id"))
    words = F.concat_ws(
        " ",
        *[F.substring(F.md5(F.concat(content.cast("string"), F.lit(f"w{j}"))), 1, 6) for j in range(12)],
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 1000 == 0, F.lit("too short"))
        .otherwise(words)
        .alias("text"),
        F.when(F.col("id") % 7 == 0, F.lit("zh")).otherwise(F.lit("en")).alias("lang"),
    )
    kept = (
        gopher_filter(docs)
        .filter(F.col("quality_verdict") == "keep")
        .select("doc_id", "text", "lang")
        .localCheckpoint(eager=False)
    )
    firsts = exact_dups(kept).select(F.col("keep_id").alias("doc_id"))
    base = kept.join(firsts, "doc_id")
    benchmark = docs.filter(F.col("doc_id") % 9973 == 0)
    corpus = base.filter(F.col("doc_id") % 9973 != 0)
    flagged = decontaminate(corpus, benchmark, n=3).select("doc_id")
    clean = corpus.join(flagged, "doc_id", "left_anti")
    imp = dsir.domain_importance(clean, F.col("lang") == "zh", min_count=2)
    top = (
        imp.filter(F.col("importance").isNotNull())
        .orderBy(F.col("importance").desc(), "doc_id")
        .limit(100)
    )
    n_clean = clean.count()
    # short docs dropped; clone cohort collapsed to one survivor (doc 3);
    # eval docs + 3-gram sharers gone
    assert n_clean < n - n // 10 - n // 1000 + 2
    assert n_clean > n // 2
    assert top.count() == 100


def test_heavy_hitters_5m(big_tasks):
    """Heavy hitters at 5M rows / 10k keys: uniform keys (~500/key)
    plus one planted hot key; with T above the uniform count only the
    hot key survives, with exact count — and the candidate stages
    never materialize the 10k-key dictionary through a full-shuffle
    count (the point of the pigeonhole+CM pruning)."""
    from decaton_spark.functions.sketches import heavy_hitters

    hot = big_tasks.sparkSession.range(50_000).select(
        F.lit("hotkey").alias("key")
    )
    df = big_tasks.select("key").unionByName(hot)
    out = heavy_hitters(df, "key", threshold=10_000, width=4096).collect()
    assert {(r["key"], r["cnt"]) for r in out} == {("hotkey", 50_000)}


def test_bm25_200k_docs(spark):
    """BM25 at 200k synthetic docs: the inverted-index build, corpus
    stats, and scoring run at 400x the fixture corpus; the planted
    uniquely-relevant doc ranks first."""
    from decaton_spark.functions.text import bm25_search

    docs = (
        spark.range(200_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("filler word common text number "),
                (F.col("id") % 1000).cast("string"),
                F.when(F.col("id") == 12345, F.lit(" needle needle needle"))
                .otherwise(F.lit("")),
            ).alias("text"),
        )
    )
    out = bm25_search(docs, ["needle", "common"], top_k=5).collect()
    assert out[0]["doc_id"] == 12345 and out[0]["rank"] == 1
    assert len(out) == 5


def test_resample_gapfill_5m(big_tasks):
    """Resample+gapfill at 5M rows: the dense grid size must equal the
    independently-computed sum of per-key bucket spans, and (ids are
    dense, so every in-span bucket has events) no gap rows exist."""
    from decaton_spark.operators.timeseries import resample_gapfill

    h = 3_600_000
    df = big_tasks.withColumn("event_value", (F.col("offset") % 7).cast("double"))
    expected = (
        df.select(
            "key",
            (F.floor(F.col("meta_timestamp_millis") / h)).alias("b"),
        )
        .groupBy("key")
        .agg(((F.max("b") - F.min("b")) + 1).alias("span"))
        .agg(F.sum("span"))
        .collect()[0][0]
    )
    out = resample_gapfill(df)
    assert out.count() == expected
    assert out.filter(F.col("n_events") == 0).count() == 0


def test_corpus_merge_2m(spark):
    """Incremental merge at 2M existing docs + 100k batch: structural
    counts are exact by construction (ids 0..2M-1 exist; the batch
    updates 50k known ids, brings 25k fresh-content new ids and 25k
    new ids whose content duplicates existing docs), and the corpus
    side must stream — no sort-merge join materializes 2M rows
    through a shuffle."""
    from decaton_spark.operators.merge import corpus_merge

    n_corpus, n_batch = 2_000_000, 100_000
    mk_text = lambda c: F.concat(  # noqa: E731
        F.lit("doc "), c.cast("string"), F.lit(" body tokens")
    )
    existing = spark.range(n_corpus).select(
        F.col("id").alias("doc_id"), mk_text(F.col("id")).alias("text")
    )
    batch = (
        # 50k updates of known ids with changed content
        spark.range(50_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("v2 "), mk_text(F.col("id"))).alias("text"),
        )
        # 25k fresh ids + fresh content
        .unionByName(
            spark.range(25_000).select(
                (F.col("id") + 3_000_000).alias("doc_id"),
                mk_text(F.col("id") + 3_000_000).alias("text"),
            )
        )
        # 25k fresh ids whose content already exists (content guard)
        .unionByName(
            spark.range(25_000).select(
                (F.col("id") + 4_000_000).alias("doc_id"),
                mk_text(F.col("id") + 1_000_000).alias("text"),
            )
        )
    )
    out = corpus_merge(existing, batch)
    counts = {
        r["origin"]: r["n"]
        for r in out.groupBy("origin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {
        "kept": n_corpus - 50_000,
        "update": 50_000,
        "insert": 25_000,
    }
