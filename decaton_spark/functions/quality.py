"""Corpus-quality heuristics for LLM training-data curation.

Gopher-style repetition statistics (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", §A1.1) and
C4-style rule filters (Raffel et al. 2020, §2.2), plus PII redaction —
all as native Spark SQL expressions so the whole filter battery fuses
into one whole-stage-codegen'd scan pass.

Scale notes: every function is a narrow per-row projection — no
shuffle, no Python, no UDFs. On 100 TB the cost is exactly one read of
the pruned (doc_id, text) columns; the filter verdict then drives a
partition-local `filter()` before anything downstream shuffles, which
is the cheapest possible place to drop low-quality documents. The
most-frequent-token statistic is an O(n log n) sort + O(n) run-scan
per document (NOT the quadratic distinct×positions formulation), so a
pathological 100k-token repetitive page costs ~10^5 comparisons, not
~10^10.

Robustness contract (each point unit-tested in tests/test_quality.py):
- null documents get verdict 'null' (never 'keep');
- documents with < 2 tokens produce an empty bigram array (no
  INVALID_ARRAY_INDEX_IN_ELEMENT_AT);
- tokenization splits on runs of whitespace and drops empty tokens, so
  '  a  b ' is 2 tokens, and mean token length comes from the token
  array itself (not a single-space closed form).

Reference parity note: the reference engine (line/decaton) has no text
operators — this module is part of the beyond-reference LLM-pipeline
surface the engine adds (SURVEY.md §7.1 "north star").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately simple, RE2/Java-compatible patterns so the DuckDB
# oracle replays them byte-for-byte ('g' flag on the DuckDB side)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?"
# +CC-NNN-NNNN, +CC-NNN-NNN-NNNN, +CC-NNNN-NNNN, ... (2 or 3 dash groups
# of 3-4 digits, so both +81-3-style trunk-less and +1-555-123-4567 match)
PHONE_RE = r"\+[0-9][0-9]?[0-9]?(-[0-9][0-9][0-9][0-9]?)(-[0-9][0-9][0-9][0-9]?)(-[0-9][0-9][0-9][0-9]?)?"


def _toks(text_col: str) -> Column:
    """Whitespace-run tokenization with empty tokens dropped.

    split(trim(t), '\\s+') still yields [''] for an empty/all-space
    document; the filter turns that into [] so n_tokens is 0, not 1.
    NULL text propagates to a NULL token array (size() -> NULL).
    """
    return F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


def _top_token_count(toks: Column) -> Column:
    """Count of the single most frequent token, via array_sort + a
    linear run-length scan (O(n log n), vs the naive O(n_distinct * n)
    transform+filter which is quadratic on exactly the repetitive
    documents this module exists to catch)."""
    return F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition features (Gopher §A1.1 analogues).

    - ``dup_token_frac``: 1 - distinct/total unigrams — high for
      boilerplate and keyword-stuffed pages. NULL when n_tokens = 0.
    - ``dup_bigram_frac``: 1 - distinct/total bigrams — catches looped
      phrases that unigram stats miss. 0.0 when the document has < 2
      tokens (no bigrams => no duplication), NULL for NULL text.
    - ``top_token_frac``: share of the single most frequent token.

    All integer combinatorics with one final rounded division so the
    DuckDB oracle reproduces values exactly.
    """
    # Stage the token array ONCE behind a projection barrier: the
    # split+filter is non-cheap, so CollapseProject keeps the two
    # Projects separate instead of inlining the tokenization into
    # every consumer expression — without this, the stats below
    # re-tokenized the document 5+ times and docs_gopher_filter ran
    # 2.2x slower at sf0.1 (2.84 s -> 1.28 s measured, round 8)
    staged = df.withColumn("__rs_toks", _toks(text_col))
    toks = F.col("__rs_toks")
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # bigrams [t1 t2, t2 t3, ...] as zip_with over two offset slices —
    # bit-identical to the old transform(sequence, i -> concat_ws(
    # element_at, element_at)) form but 7.8× faster (3.09 s → 0.40 s
    # single-threaded on sf0.1: per-element element_at in a HOF lambda
    # runs interpreted); guarded so n<2 yields []
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    n_bi_distinct = F.size(F.array_distinct(bigrams))
    top_cnt = _top_token_count(toks)
    return (
        staged.withColumn("n_tokens", n.cast("long"))
        .withColumn(
            "dup_token_frac",
            F.when(n > 0, F.round((n - n_distinct) * 1.0 / n, 6)),
        )
        .withColumn(
            "dup_bigram_frac",
            F.when(n_bi > 0, F.round((n_bi - n_bi_distinct) * 1.0 / n_bi, 6))
            .when(n.isNotNull(), F.lit(0.0)),
        )
        .withColumn(
            "top_token_frac",
            F.when(n > 0, F.round(top_cnt * 1.0 / n, 6)),
        )
        .drop("__rs_toks")
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    max_dup_token_frac: float = 0.6,
    max_top_token_frac: float = 0.2,
) -> DataFrame:
    """Label each document keep/drop with the first failing rule
    (C4/Gopher-style battery). Emits ``quality_verdict`` in
    {'keep','null','too_short','too_long','token_len','repetitive',
    'dominated'} plus a rounded ``mean_token_len`` column.

    The rule order is fixed so the verdict is deterministic and the
    oracle can replay it as a CASE chain. NULL text gets its own
    leading rule — NULL predicates are non-true, so without it a null
    document would fall through every when() into 'keep'.
    """
    # total token length WITHOUT touching the token array: every
    # non-whitespace character of the text lands in exactly one token
    # (split discards the \s+ separators, the filter drops empties), so
    # sum(length(token)) == length(regexp_replace(text, '\\s', '')) —
    # a codegen'd native regex instead of an interpreted per-token
    # aggregate lambda (and it lets the whole filter reuse
    # repetition_stats' n_tokens instead of re-tokenizing; round 8)
    total_len = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    with_stats = repetition_stats(df, text_col)
    n = F.col("n_tokens")
    mean_len = F.when(n > 0, total_len * 1.0 / n)
    with_stats = with_stats.withColumn(
        "mean_token_len", F.round(mean_len, 6)
    )
    verdict = (
        F.when(F.col(text_col).isNull(), F.lit("null"))
        .when(n < min_tokens, F.lit("too_short"))
        .when(n > max_tokens, F.lit("too_long"))
        .when(
            (mean_len < min_mean_token_len) | (mean_len > max_mean_token_len),
            F.lit("token_len"),
        )
        .when(F.col("dup_token_frac") > max_dup_token_frac, F.lit("repetitive"))
        .when(F.col("top_token_frac") > max_top_token_frac, F.lit("dominated"))
        .otherwise(F.lit("keep"))
    )
    return with_stats.withColumn("quality_verdict", verdict)


def pii_redact(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Redact emails / IPv4 addresses / intl phone numbers, emitting
    per-document match counts alongside the scrubbed text.

    Order matters (emails first — an address can contain digits that
    would otherwise half-match the phone pattern); the oracle replays
    the same three-stage pipeline.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", n_emails.cast("long"))
        .withColumn("n_ips", n_ips.cast("long"))
        .withColumn("n_phones", n_phones.cast("long"))
        .withColumn(out_col, scrubbed)
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination — flag corpus documents that share any
    ``n``-gram with an evaluation set (the filter every serious
    training pipeline runs so eval questions don't leak into training
    data; 8–13-gram overlap is the published practice, scaled down to
    the fixture corpus).

    Plan shape at 100 TB: the benchmark's distinct n-grams are SMALL
    (eval sets are thousands of documents) and broadcast; the corpus
    explodes its distinct per-doc shingles once (narrow) and the hit
    count is one partial-aggregatable groupBy after the broadcast
    equi-join — the corpus is never shuffled by gram.

    Returns (doc_id, n_contaminated_ngrams) for flagged documents
    only; anti-join the result against the corpus to drop them.
    """
    from decaton_spark.functions.dedup import word_shingles

    bg = benchmark.select(
        F.explode(word_shingles(text_col, n)).alias("gram")
    ).distinct()
    dg = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    )
    return (
        dg.join(F.broadcast(bg), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )


def _bloom_positions(m_bits: int, k: int) -> list[str]:
    """The ``k`` Bloom bit positions of a gram, as SQL fragments over a
    pre-computed md5-hex column ``h``: position ``j`` is the 8-hex-digit
    slice at digits 8j+1..8j+8 of ONE digest, mod ``m_bits`` — the same
    one-digest banding trick as ``minhash_signature`` (k md5s per gram
    would triple the dominant cost for no independence gain; the md5
    digit windows are already pairwise-independent-enough for a Bloom
    filter's FP analysis)."""
    from decaton_spark.functions import hashing

    if not 1 <= k <= 4:
        raise ValueError("md5 yields 32 hex digits = at most 4 8-digit positions")
    return [
        f"({hashing.hex_to_long('h', start=1 + 8 * j, ndigits=8)} % {m_bits})"
        for j in range(k)
    ]


def build_bloom_bitmap(
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 16384,
    k: int = 3,
) -> list[int]:
    """OR-fold the eval set's distinct ``n``-grams into an ``m_bits``
    Bloom bitmap (``k`` hash positions per gram, banded out of one md5
    digest), returned as ``m_bits/32`` 32-bit words packed in Python
    ints.

    This is the offline-index half of ``bloom_decontaminate`` — the
    analog of the persisted ANN centroid store: built once per eval-set
    release, O(m_bits) driver memory regardless of how many n-grams the
    eval set holds. 32-bit words (not 64) so the packed values stay
    positive in both engines' signed BIGINT — no sign-bit replay trap.
    """
    from decaton_spark.functions.dedup import word_shingles

    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    m_words = m_bits // 32
    bg = benchmark.select(
        F.explode(word_shingles(text_col, n)).alias("gram")
    ).distinct()
    pos = bg.select(F.md5("gram").alias("h")).select(
        F.explode(
            F.array(*[F.expr(p) for p in _bloom_positions(m_bits, k)])
        ).alias("p")
    )
    rows = (
        pos.select(
            F.expr("CAST(p DIV 32 AS INT)").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()  # bounded: at most m_bits/32 rows, independent of data
    )
    filled = {int(r["w"]): int(r["bits"]) for r in rows}
    return [filled.get(i, 0) for i in range(m_words)]


def bloom_decontaminate(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_bits: int = 16384,
    k: int = 3,
    bitmap: list[int] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Constant-memory benchmark decontamination — the 100 TB scale
    path of :func:`decontaminate` for when the eval set's n-gram
    universe is too large to broadcast as a join side (multi-benchmark
    unions at 8-13-gram widths run to 10^8+ grams).

    The eval grams collapse into an ``m_bits`` Bloom bitmap
    (:func:`build_bloom_bitmap`); the corpus probe is then a pure
    projection — each corpus shingle tests its ``k`` bucket positions
    (banded out of one md5 digest) against the *inlined literal*
    bitmap, so the plan has ZERO joins and exactly one shuffle (the
    final per-doc hit count, partial-aggregated map-side). False
    positives over-flag at the standard Bloom rate (safe direction for
    decontamination: never a false negative — every truly contaminated
    document is flagged); the DuckDB oracle replays the identical
    bitmap and hashes, so both engines agree bit-for-bit including the
    false positives.

    The per-gram verdict is a 0/1 column SUMMED per document with a
    HAVING-style filter on the aggregate — deliberately NOT a row-level
    ``filter()``: predicate pushdown substitutes projected columns back
    into a pushed condition, so a filter over hoisted hash columns
    re-computes every digest inside the predicate (measured 3×
    slowdown); an aggregate consumes the projection as-is.

    Pass a pre-built ``bitmap`` to skip the build (the offline-index
    usage); otherwise it is built from ``benchmark`` inline.

    ``num_partitions``: optional pre-hash repartition of the raw
    (id, text) corpus — same rationale and caveat as
    ``minhash_band_signatures``: the shingle+digest stage is CPU-bound,
    so when the source is a few large files (fewer splits than cores)
    the extra shuffle of the raw text is repaid ~cores-fold; on a real
    many-split table leave it None.
    """
    from decaton_spark.functions.dedup import word_shingles

    if bitmap is None:
        if benchmark is None:
            raise ValueError("pass either a benchmark frame or a pre-built bitmap")
        words = build_bloom_bitmap(
            benchmark, text_col=text_col, n=n, m_bits=m_bits, k=k
        )
    else:
        words = bitmap
    if len(words) != m_bits // 32:
        raise ValueError("bitmap length must be m_bits/32")
    # SQL-text literal (one parse, no py4j-per-element — the PQ-codebook
    # pattern); constant-folds to a single array Literal in the plan
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    if num_partitions:
        df = df.repartition(num_partitions)
    dg = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    )
    # hoist the digest, then the k positions, each into its own
    # projection: every downstream reference is to a column, the md5 is
    # computed ONCE per gram, and CollapseProject keeps the barriers
    # (non-cheap expressions referenced more than once — the
    # minhash_signature rationale)
    hashed = dg.select("doc_id", F.md5("gram").alias("h"))
    positioned = hashed.select(
        "doc_id",
        *[
            F.expr(p).alias(f"p{j}")
            for j, p in enumerate(_bloom_positions(m_bits, k))
        ],
    )
    bit_tests = [
        f"((shiftright(element_at({arr_sql}, CAST(p{j} DIV 32 AS INT) + 1), "
        f"CAST(p{j} % 32 AS INT)) & CAST(1 AS BIGINT)) = CAST(1 AS BIGINT))"
        for j in range(k)
    ]
    hit = " AND ".join(bit_tests)
    return (
        positioned.select(
            "doc_id",
            F.expr(hit).cast("long").alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.sum("hit").alias("n_flagged_ngrams"))
        .filter(F.col("n_flagged_ngrams") > 0)
    )


def novelty_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-document n-gram novelty: how much of a document's distinct
    shingle set appears here FIRST (first = lowest doc id — ingestion
    order in an append-only corpus), versus being repeated boilerplate.

    ``num_partitions`` hash-spreads the corpus by id before the
    shingle fold: the fold is the dominant CPU (the ×100 ladder
    numbers below) and otherwise runs at the scan's split count
    (round-9 stage audit: single-task at sf0.1), and the checkpointed
    gram stream inherits that partition count for both consumers.

    The marginal-utility gauge curation samplers weight by (near-dup
    removal keeps one copy of everything; novelty scoring says how much
    *new* text each kept document actually contributes — RefinedWeb
    and Gopher both report corpus-level duplicate-text mass; this is
    its per-document decomposition).

    Plan shape at 100 TB: per-doc distinct shingles explode once
    (narrow — ``word_shingles`` already deduplicates inside the array,
    so there is no (doc, gram) shuffle); first-seer election is one
    partial-aggregable ``min`` per gram md5 (the same skew-safe
    election ``span_dedup`` uses — a boilerplate gram appearing in 10^8
    docs partial-aggregates map-side instead of hot-keying a window).
    The per-doc verdict NEVER joins the gram stream back on the gram
    hash (the pre-round-9 plan — it re-shuffled all |grams| rows a
    second time and dominated the ×100 ladder wall at 131 s): because
    ``novel_grams(doc) = |{h : first_doc(h) = doc}|``, the election
    output — already only |distinct grams| rows — re-aggregates by its
    OWN value column, and the final join is doc-sized × doc-sized.
    Gram rows therefore shuffle exactly once (the election), grams per
    doc reduce map-side (doc rows are scan-colocated), and the heavy
    stream is consumed by two partial aggregations instead of a
    shuffle join. Every ratio is floor-division of nonnegative
    integers, exact in both engines.

    Returns (doc_id, n_grams, novel_grams, novelty_pml) — novelty in
    exact per-mille.
    """
    from decaton_spark.functions.dedup import word_shingles

    if num_partitions:
        df = df.repartition(num_partitions, id_col)
    # NULL-text docs are EXCLUDED, matching the registered oracle and
    # the pre-round-9 plan, where the NULL gram hash fell out of the
    # h-equi-join (NULL ≠ NULL). The explicit filter is required now
    # that the join-back is gone — without it the NULL gram survives
    # the groupBys and resurrects NULL-text docs (caught by the
    # round-9 adversarial NULL/empty-text pin in test_quality.py).
    grams = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(text_col, n)).alias("_g"),
        )
        .select("doc_id", F.md5("_g").alias("h"))
    )
    # two consumers (per-doc count + election) would re-run the
    # shingle-fold + explode + md5 lineage twice — Catalyst can't
    # reuse the exchange because both sides aggregate below it. ONE
    # lazy checkpoint materializes the gram stream once. Measured
    # round 9, ×100 ladder: computing n_grams instead as
    # size(word_shingles) on a second raw-text scan (no checkpoint,
    # election as sole gram consumer) was 117 s vs 66 s for this form
    # — the shingle fold itself is the dominant ×100 cost, so it must
    # run once, and the checkpointed gram rows (doc_id, h) are far
    # cheaper to re-read than to re-derive. The skew-safe partial-agg
    # election is kept — a window over gram partitions would put a
    # 10^8-doc boilerplate gram into one task.
    grams = grams.localCheckpoint(eager=False)
    per_doc = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    first = grams.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("novel_grams")
    )
    return (
        per_doc.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("novel_grams"), F.lit(0))
            .cast("long")
            .alias("novel_grams"),
        )
        .select(
            "*",
            F.expr("CAST((novel_grams * 1000) DIV n_grams AS BIGINT)").alias(
                "novelty_pml"
            ),
        )
    )


def novelty_ingest_batch(
    batch_df: DataFrame,
    store_dir: str,
    batch_id: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Streaming-ingest novelty: the ``foreachBatch`` body that scores
    each arriving microbatch against every gram seen in EARLIER
    batches (a persistent (gram-md5, first_doc) parquet store) plus
    earlier docs of the same batch — so for an append-only corpus with
    monotone doc ids the stream reproduces ``novelty_stats`` exactly,
    for ANY microbatch split (the batch-equivalence contract the other
    streaming operators prove).

    The store grows by NEW grams only, written under
    ``batch=<batch_id>`` with overwrite — a replayed batch rewrites the
    same directory, so the sink is effectively-once (the
    ``idempotent_parquet_sink`` discipline). At scale the store is the
    corpus gram table partitioned by hash — the probe is one equi-join
    per batch against it; the corpus itself never rescans.

    Returns the per-doc novelty frame for this batch (collect or sink
    it inside foreachBatch).
    """
    from pyspark.errors import AnalysisException

    from decaton_spark.functions.dedup import word_shingles

    spark = batch_df.sparkSession
    grams = (
        batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(text_col, n)).alias("_g"),
        )
        .select("doc_id", F.md5("_g").alias("h"))
        .localCheckpoint(eager=False)
    )
    try:
        seen = spark.read.parquet(store_dir).select("h", "first_doc")
    except AnalysisException:
        seen = spark.createDataFrame([], schema="h string, first_doc long")
    batch_first = grams.groupBy("h").agg(F.min("doc_id").alias("bfirst"))
    # store wins: its first_doc precedes every doc of this batch
    # (monotone-ingest contract) — coalesce(store, batch)
    first = batch_first.join(seen, "h", "left").select(
        "h",
        F.coalesce(F.col("first_doc"), F.col("bfirst")).alias("first_doc"),
        F.col("first_doc").isNotNull().alias("_known"),
        "bfirst",
    ).localCheckpoint(eager=False)
    out = (
        grams.join(first.select("h", "first_doc"), "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            ).alias("novel_grams"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("novel_grams").cast("long").alias("novel_grams"),
            F.expr("CAST((novel_grams * 1000) DIV n_grams AS BIGINT)").alias(
                "novelty_pml"
            ),
        )
    )
    new = first.filter(~F.col("_known")).select(
        "h", F.col("bfirst").alias("first_doc")
    )
    new.write.mode("overwrite").parquet(f"{store_dir}/batch={batch_id}")
    return out


def ccnet_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's per-language perplexity bucketing: score every document
    with the corpus-unigram LM (``text.lm_score``), then cut each
    language into ``n_buckets`` equal tertiles by score — bucket 1
    ("head", highest mean log-prob / lowest perplexity) is what CCNet
    keeps for LM pretraining, "tail" is the noise it drops. Per-language
    cuts matter: absolute perplexity is not comparable across languages,
    only ranks within one are.

    Plan: the LM scorer's materialized-tf skeleton + ONE ntile window
    per language partition (the per-language doc list is the window
    partition — no global sort), then a partial-agg rollup. The
    tie-break (score desc, doc_id) makes tertile assignment exact, so
    the aggregate is oracle-replayable: counts, token sums, and the
    mean score in integer micro-units — scores re-quantize to BIGINT
    micros (scale-0 round of a 6-decimal double: exact), sum order-free,
    and the mean is floor() of an exact-in-double quotient, so no
    fractional rounding half exists to disagree on.

    Returns (lang, bucket, n_docs, total_tokens, mean_logprob_micro).
    """
    from pyspark.sql import Window

    from decaton_spark.functions.text import lm_score

    scores = lm_score(df, text_col=text_col, id_col=id_col)
    langs = df.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id")
    )
    tiled = scores.join(langs, "doc_id").withColumn(
        "tile", F.ntile(n_buckets).over(w)
    )
    bucket = (
        F.when(F.col("tile") == 1, F.lit("head"))
        .when(F.col("tile") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        if n_buckets == 3
        else F.concat(F.lit("b"), F.col("tile").cast("string"))
    )
    return (
        tiled.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.floor(
                F.sum(
                    F.round(F.col("avg_logprob") * 1_000_000).cast("long")
                ).cast("double")
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("mean_logprob_micro"),
        )
        .withColumn("n_docs", F.col("n_docs").cast("long"))
        .select("lang", "bucket", "n_docs", "total_tokens", "mean_logprob_micro")
    )
