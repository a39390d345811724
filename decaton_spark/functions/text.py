"""Text-analysis operators for LLM-data pipelines over ``documents``.

All implemented as native Spark SQL expressions (codegen'd, no Python
on the hot path): language ID (stopword-marker heuristic), quality
scoring, token counting (whitespace + regex token classes), and
rolling-hash document fingerprinting.

Scale notes: every function here is a narrow projection — Catalyst
prunes the scan to ``text`` (+id) only, there is no shuffle, and the
work parallelizes embarrassingly across row groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from decaton_spark.functions.hashing import token_fingerprint

# marker stopwords per language for the n-gram/stopword heuristic;
# deliberately tiny and deterministic (real pipelines plug fastText etc.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "y"),
}

TOKEN_REGEX = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "predicted_lang") -> DataFrame:
    """Predict language by marker-stopword hit count; ties break by
    language code order; zero hits => 'und' (BCP-47 undetermined)."""
    toks = F.split(F.col(text_col), " ")
    scores = [
        (
            lang,
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # first language (in code order) achieving the max score wins
    for lang, score in reversed(scores):
        pred = F.when((best > 0) & (score == best), F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    All-integer feature arithmetic with a single final division,
    rounded — keeps the values exactly reproducible in the oracle.
    """
    t = F.col(text_col)
    toks = F.split(t, " ")
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9 ]", ""))
    stop_list = F.array(*[F.lit(s) for s in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_list, x)))
    avg_token_len = F.round((n_chars - n_tokens + 1) / n_tokens, 6)
    quality = F.round(
        (F.lit(1.0) * n_stop / n_tokens) - (F.lit(1.0) * n_punct / n_chars), 6
    )
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_punct", n_punct.cast("long"))
        .withColumn("n_stopwords", n_stop.cast("long"))
        .withColumn("avg_token_len", avg_token_len)
        .withColumn("quality", quality)
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish regex token count
    (letter runs / digit runs / single punctuation)."""
    t = F.col(text_col)
    ws = F.size(F.split(t, " ")).cast("long")
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).cast("long")
    return df.withColumn("ws_tokens", ws).withColumn("bpe_tokens", bpe)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Order-sensitive rolling polynomial hash of the token stream
    (mod 1e9+7) — a compact document identity for exact-ish dedup
    that, unlike md5(text), survives re-serialization of whitespace
    (tokens are the unit, not raw bytes)."""
    return df.withColumn(out_col, F.expr(token_fingerprint(f"split({text_col}, ' ')")))


def tfidf_top_terms(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document top-N terms by tf·idf — corpus-statistics keyword
    extraction (the signal behind boilerplate detection and topical
    tagging in training-data curation).

    idf = ln(N / df) on IEEE doubles. Plan shape at 100 TB:
      1. per-(doc, term) tf — partial-aggregatable groupBy over the
         single corpus explode, MATERIALIZED once (localCheckpoint;
         at cluster scale: persisted to storage). Spark has no
         DAG-level subplan sharing, so without materialization the
         scan+explode+aggregate would run twice — once for tf, once
         for document frequency (verified: no ReusedExchange fires);
      2. document frequency — groupBy term over the materialized tf
         rows (no second explode, no second scan);
      3. tf ⋈ df on term — equi-join (stop words are the hot keys, AQE
         skew-split eligible); corpus size N rides along as a
         broadcast 1-row aggregate, never a driver-side collect;
      4. per-doc top-N — bounded window over doc_id.
    Returns (doc_id, rank, term, score).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                ),
                round_digits,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "rank", "term", "score")
    )


def doc_chunks(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window chunking: split each document into windows of
    ``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens −
    overlap`` — the context-window preparation step of a training/RAG
    pipeline (every chunk shares ``overlap`` tokens with its
    predecessor so no span is ever cut mid-context).

    A document with n ≤ chunk_tokens tokens yields one chunk;
    otherwise ceil((n − chunk_tokens)/stride) + 1, so the final chunk
    always reaches the last token. Pure narrow projection + generator:
    no shuffle, no UDF — at 100 TB this runs entirely map-side at scan
    parallelism.

    Returns (doc_id, chunk_idx, n_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(stride))).cast("int") + 1
    )
    chunk = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
            )
        ).alias("chunk_idx", "chunk_toks"),
    )
    return chunk.select(
        "doc_id",
        "chunk_idx",
        F.size(F.col("chunk_toks")).cast("long").alias("n_tokens"),
        F.array_join(F.col("chunk_toks"), " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Linear sequence packing: assign documents to fixed-token-budget
    training packs — the step that turns a shuffled corpus into
    constant-length training sequences.

    Distributed shape: documents are first routed to ``n_buckets``
    streams by a content-stable hash (so packing is reproducible and
    embarrassingly parallel — each bucket packs independently, exactly
    how multi-worker packers shard), then packed greedily in doc-id
    order by a running token sum; pack boundary = the budget overflow
    (classic linear packing, not NP-hard bin packing). A document
    longer than the budget becomes its own (oversized) pack, matching
    what packers do before chunking.

    Plan: one window cumsum per bucket — a single shuffle on the
    bucket key; within-bucket sort is bounded by corpus/n_buckets, and
    at 100 TB you raise ``n_buckets`` to the write parallelism you
    want. Integer-only arithmetic, so the oracle replays it exactly.

    Returns one row per pack: (bucket, pack_id, n_docs, pack_tokens,
    first_doc, last_doc).
    """
    toks = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).cast("long")
    from decaton_spark.functions.hashing import md5_bucket

    bucket = F.expr(
        md5_bucket(f"CAST({id_col} AS STRING)", n_buckets, salt="pack|")
    )
    d = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("n_tokens"), bucket.alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pack_id = floor((cumsum - 1) / budget): a doc whose tokens cross
    # the boundary closes the pack it started in (greedy linear rule)
    packed = d.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "pack_id", F.floor((F.col("cum") - 1) / F.lit(float(budget_tokens))).cast("long")
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def build_vocab(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 30000,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked token vocabulary with stable contiguous ids —
    the vocab-construction step of a tokenizer-training pipeline
    (BPE/WordPiece trainers start from exactly this corpus count
    table).

    Returns (token_id, token, n_occurrences) with token_id dense from
    1 by descending frequency, ties broken by token text so the
    mapping is deterministic across runs and engines.

    Scale shape: the count is one partial-aggregable groupBy; the
    ranking is a distributed TakeOrdered of the AGGREGATED table
    (|distinct tokens| rows, Zipf-bounded) to ``top_k`` rows — the
    row_number window then runs over that bounded result only, never
    over the corpus. No full-table single-partition sort anywhere.
    """
    counts = (
        df.select(F.explode(F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        )).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return counts.select(
        F.row_number().over(w).alias("token_id"), "token", "n_occurrences"
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    round_digits: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full-text BM25 search: score every document against a bag of
    query terms and return the top-k — keyword retrieval over a
    corpus, the lexical half of a RAG / data-curation search stack.

    Uses the Lucene/Okapi formulation with the +1 idf shift (so idf is
    always positive): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Cross-engine determinism: each per-(doc, term) contribution is
    rounded then summed as DECIMAL, so the doc score is independent of
    aggregation order and bit-identical in the DuckDB oracle; ranking
    ties break on doc_id.

    Scale shape (100 TB corpus):
    1. (doc, term, tf) — one explode + partial-agg groupBy,
       materialized once (localCheckpoint; cluster: persisted) because
       doc-length, document-frequency AND scoring all read it — Spark
       has no DAG-level subplan sharing;
    2. dl (doc length) and df (document frequency) are groupBys over
       those aggregated rows — never a second corpus scan;
    3. N and avgdl ride along as a broadcast 1-row aggregate;
    4. scoring touches only tf rows whose term is in the query — the
       query-term filter is an isin() literal pushed into the tf scan,
       so the join explosion is |query terms| x |matching docs|;
    5. top-k is a TakeOrdered of the per-doc scores (no global sort).

    ``num_partitions`` hash-spreads the corpus by id before the
    tokenize+count stage that materializes tf: on a source with fewer
    scan splits than cores that stage otherwise runs at the split
    count (round-9 stage audit: single-task at sf0.1), and the
    checkpointed tf inherits the collapse for all five consumers.
    Partitioning never changes the aggregated values.
    """
    if num_partitions:
        df = df.repartition(num_partitions, id_col)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    # Round-9 restructure (guide §2.3, shuffle fewer bytes): the old
    # form aggregated document frequency over the ENTIRE vocabulary and
    # doc length over the ENTIRE corpus, then probed both for the
    # handful of query terms/matching docs. Same values, small inputs:
    # - df comes from the query-term-filtered tf rows (df(term) = row
    #   count per term either way);
    # - dl is aggregated only for docs that match a query term (a
    #   broadcast semi-join prunes tf before the shuffle — §3.2);
    # - the corpus-wide stats (N, avgdl) keep the old two-level
    #   per-doc-then-global aggregation (bit-identical arithmetic),
    #   they just no longer share the join's dl table.
    matched_tf = tf.filter(F.col("term").isin(list(query_terms)))
    dfreq = matched_tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # the matched-doc set is bounded only by query-term selectivity: a
    # frequent term makes it corpus-scale, so no broadcast HINT here —
    # AQE converts the semi-join to broadcast at runtime when the side
    # is actually small, and keeps a shuffle join when it is not
    # (round-10, ADVICE r9: a static hint would exceed the 8 GB
    # broadcast cap / driver memory at the 100 TB corpus this targets).
    # The semi-join keying (doc_id) matches the groupBy, so the
    # sort-merge path shares one exchange with the aggregation.
    dl = (
        tf.join(
            matched_tf.select("doc_id").distinct(),
            "doc_id",
            "left_semi",
        )
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
    )
    stats = (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("dl").cast("decimal(28,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avgdl"),
        )
    )
    matched = (
        matched_tf
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf * tf_norm, round_digits).cast("decimal(38,6)")
    scored = (
        matched.groupBy("doc_id")
        .agg(
            F.sum(contrib).cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        # distributed TakeOrdered of the per-doc scores; the ranking
        # window then runs over <= top_k rows, never the full corpus
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "doc_id", "score", "n_terms_hit")
    )


def lm_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-unigram language-model scoring: each document's mean
    token log-probability under the corpus's own unigram distribution
    — the CCNet-style "LM perplexity bucket" quality signal (docs full
    of corpus-rare tokens score low; boilerplate scores high).

    avg_logprob(d) = (1/|d|) * sum over tokens t of tf(d,t)*ln(c(t)/T)
    with c(t) the corpus count of t and T total corpus tokens.

    Determinism: the per-(doc, term) contribution is rounded then
    DECIMAL-summed (order-independent), the final division happens
    once and is rounded — bit-identical in the DuckDB oracle.

    Scale shape: identical skeleton to tf-idf — one corpus explode
    into a materialized (doc, term, tf) partial aggregate; corpus
    counts are a groupBy over those rows; T broadcasts as a 1-row
    aggregate; the join on term is equi (stop words = hot keys, AQE
    skew-split eligible).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = corpus.agg(
        F.sum(F.col("ct").cast("decimal(28,0)")).cast("double").alias("t_total")
    )
    contrib = F.round(
        F.col("tf") * F.log(F.col("ct") / F.col("t_total")), round_digits
    ).cast("decimal(38,6)")
    return (
        tf.join(corpus, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(contrib).cast("double") / F.sum("tf"), round_digits
            ).alias("avg_logprob"),
        )
    )


#: power-of-two sequence-length buckets for padded-batch planning
LENGTH_BUCKETS = [2**i for i in range(18)]  # 1 .. 131072


def bucket_expr(n_col: str, buckets: list[int] | None = None) -> Column:
    """Smallest bucket ≥ token count, as an explicit CASE ladder —
    bounded, branch-identical in Spark and the SQL oracle (float
    log2 at exact power-of-two boundaries is the kind of cross-engine
    trap the ladder avoids)."""
    bs = buckets or LENGTH_BUCKETS
    expr = F.lit(bs[-1])
    for b in reversed(bs[:-1]):
        expr = F.when(F.col(n_col) <= b, F.lit(b)).otherwise(expr)
    return expr.cast("long")


def length_bucket_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Padded-batch planning stats: bucket documents by
    power-of-two whitespace-token length and report, per bucket, the
    document count, real token mass, padded capacity
    (bucket_width · n_docs — what a fixed-shape batch actually
    allocates), and the exact per-mille padding waste.

    This is the measurement behind length-grouped batching (picking
    bucket boundaries so attention FLOPs aren't burned on pad tokens);
    at 100 TB it is one shuffle-free narrow projection into a
    partial-aggregable groupBy over ≤18 groups.
    """
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    return (
        toks.select(bucket_expr("n_tokens").alias("bucket"), "n_tokens")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "total_tokens",
            (F.col("bucket") * F.col("n_docs")).alias("capacity"),
            (F.col("bucket") * F.col("n_docs") - F.col("total_tokens")).alias(
                "padding_tokens"
            ),
            F.expr(
                "CAST(((bucket * n_docs - total_tokens) * 1000)"
                " DIV (bucket * n_docs) AS BIGINT)"
            ).alias("waste_pml"),
        )
    )


def bigram_pairs(text_col: str = "text") -> Column:
    """Adjacent-token (prev, cur) struct pairs of a whitespace-
    tokenized document — the shared bigram constructor for LM scoring
    and collocation mining.

    Built as ``arrays_zip`` over two offset slices: the codegen-
    friendly form, 7.6× faster than ``transform(sequence(1, n-1),
    i -> struct(element_at(toks, i), element_at(toks, i+1)))`` (the
    per-element lambda runs interpreted) for bit-identical output —
    the equivalence is pinned on adversarial inputs by
    ``tests/test_ngram_constructions.py`` against this very function.
    NULL text and <2-token docs yield the empty array, exactly as the
    old guarded form did."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("prev"),
            F.slice(toks, 2, n - 1).alias("cur"),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))


def lm_score_bigram(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    round_digits: int = 6,
) -> DataFrame:
    """Bigram-interpolated LM scoring — the modeling upgrade over
    ``lm_score``'s unigram: each position i ≥ 2 contributes
    ``ln(λ·P(tᵢ|tᵢ₋₁) + (1−λ)·P(tᵢ))`` (Jelinek–Mercer interpolation;
    the first token falls back to its unigram), averaged per document.
    Repetitive boilerplate scores HIGH under the bigram term even when
    its unigrams are unremarkable — the signal CCNet's 5-gram KenLM
    uses, at the n=2 point of the same family.

    Count plumbing shares one corpus bigram explode: unigram counts
    are recovered as first-token + bigram-successor occurrences (no
    second explode); prefix counts fold from the bigram table. Every
    probability is a division of exact integer counts, the log is
    rounded per (doc, prev, cur) group, contributions multiply the
    group count in DECIMAL (exact), and one final division closes —
    the tf-idf/lm_score determinism discipline.

    Returns (doc_id, n_tokens, avg_logprob).
    """
    toks = F.split(F.col(text_col), " ")
    first = df.select(
        F.col(id_col).alias("doc_id"), F.element_at(toks, 1).alias("cur")
    )
    bigr = bigram_pairs(text_col)
    lb = df.select(
        F.col(id_col).alias("doc_id"), F.explode(bigr).alias("b")
    ).select("doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    lb = lb.localCheckpoint(eager=False)  # 3 consumers below
    bg = lb.groupBy("doc_id", "prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    cbg = bg.groupBy("prev", "cur").agg(F.sum("n").cast("long").alias("cb"))
    cp = cbg.groupBy("prev").agg(F.sum("cb").cast("long").alias("cpn"))
    uni = (
        first.select("cur")
        .unionByName(lb.select("cur"))
        .groupBy(F.col("cur").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    uni = uni.localCheckpoint(eager=False)  # bigram + first-token consumers
    tt = uni.agg(
        F.sum(F.col("c1").cast("decimal(28,0)")).cast("double").alias("t_total")
    )
    mix = F.round(
        F.log(
            F.lit(lam) * (F.col("cb").cast("double") / F.col("cpn"))
            + F.lit(1.0 - lam) * (F.col("c1").cast("double") / F.col("t_total"))
        ),
        round_digits,
    ).cast("decimal(24,6)")
    bi_contrib = (
        bg.join(cbg, ["prev", "cur"])
        .join(cp, "prev")
        .join(uni, bg["cur"] == uni["term"])
        .crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            F.col("n").alias("pos"),
            (mix * F.col("n").cast("decimal(14,0)")).alias("contrib"),
        )
    )
    f_contrib = (
        first.join(uni, first["cur"] == uni["term"])
        .crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            F.lit(1).cast("long").alias("pos"),
            F.round(
                F.log(F.col("c1").cast("double") / F.col("t_total")),
                round_digits,
            )
            .cast("decimal(24,6)")
            .cast("decimal(38,6)")
            .alias("contrib"),
        )
    )
    allc = bi_contrib.select(
        "doc_id", "pos", F.col("contrib").cast("decimal(38,6)").alias("contrib")
    ).unionByName(f_contrib)
    return allc.groupBy("doc_id").agg(
        F.sum("pos").cast("long").alias("n_tokens"),
        F.round(
            F.sum("contrib").cast("double") / F.sum("pos"), round_digits
        ).alias("avg_logprob"),
    )


def topic_tag(
    df: DataFrame,
    topics: dict[str, list[str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Dictionary-based topic tagging: count token occurrences per
    topic keyword list and label each document with its argmax topic
    (ties → lexicographically first topic) — the domain-labeling step
    mixture/weighting pipelines need when no classifier is available
    (the keyword lists play the role of a FastText label head).

    ZERO shuffles: each topic's hit count is an array-filter over the
    token array against an inlined keyword literal, and the argmax is
    ``array_min`` over (−hits, topic) structs — the whole operator is
    one projection at scan parallelism, for any corpus size.

    Returns (doc_id, topic, topic_hits, total_hits) plus any
    ``carry`` passthrough columns (so compositions — e.g. the
    topic-conditioned mixture — stay single-scan instead of
    self-joining the corpus); ``topic`` is NULL when no keyword
    matches at all.
    """
    toks = F.split(F.col(text_col), " ")
    hit_cols = {}
    for name, words in sorted(topics.items()):
        lit_words = F.array(*[F.lit(w) for w in sorted(set(words))])
        hit_cols[name] = F.size(
            F.filter(toks, lambda t: F.array_contains(lit_words, t))
        ).cast("long")
    total = None
    for c in hit_cols.values():
        total = c if total is None else total + c
    best = F.array_min(
        F.array(
            *[
                F.struct((-c).alias("neg"), F.lit(n).alias("topic"))
                for n, c in sorted(hit_cols.items())
            ]
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in carry],
        F.when(total > 0, best["topic"]).alias("topic"),
        F.when(total > 0, -best["neg"]).cast("long").alias("topic_hits"),
        total.alias("total_hits"),
    )


def zipf_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Zipf's-law fit over the corpus frequency spectrum: least-squares
    slope/intercept/R² of ln(freq) vs ln(rank) for the ``top_k`` most
    frequent terms — the drift gauge a corpus pipeline watches across
    versions (natural text sits near slope −1; a crawl gone wrong —
    boilerplate floods, template spam, tokenizer breakage — bends the
    spectrum before any downstream metric moves).

    One corpus scan into term counts (partial-agg), a bounded top-k
    (TakeOrdered, never a global sort), then the regression runs over
    ≤``top_k`` rows: ln values quantize to exact 1e-6 BIGINT micros
    (scale-0 round of identical IEEE ln), moments sum order-free, and
    slope/intercept/R² evaluate in one canonical double formula —
    engine-identical.

    Returns one row: (n_terms, slope, intercept, r2_ppm).
    """
    tf = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    return zipf_fit_from_counts(tf, top_k=top_k)


def zipf_fit_from_counts(tf: DataFrame, *, top_k: int = 100) -> DataFrame:
    """``zipf_fit``'s regression over a PRE-BUILT term-frequency table
    (columns ``term``, ``ct``) — identical math and tie-breaking, so a
    caller that already has the vocabulary staged (e.g. the release
    audit's shared term table) skips the corpus re-explode."""
    top = tf.orderBy(F.col("ct").desc(), F.col("term")).limit(top_k)
    w = Window.orderBy(F.col("ct").desc(), F.col("term"))
    xy = top.withColumn("rank", F.row_number().over(w)).select(
        F.round(F.log(F.col("rank").cast("double")) * 1_000_000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("ct").cast("double")) * 1_000_000)
        .cast("long")
        .alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    d = lambda e: e.cast("double")  # noqa: E731
    covn = d(dec(F.col("n")) * F.col("sxy") - F.col("sx") * F.col("sy"))
    vxn = d(dec(F.col("n")) * F.col("sxx") - F.col("sx") * F.col("sx"))
    vyn = d(dec(F.col("n")) * F.col("syy") - F.col("sy") * F.col("sy"))
    slope = covn / vxn
    intercept = (d(F.col("sy")) - slope * d(F.col("sx"))) / d(F.col("n")) / 1e6
    return m.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(covn * covn / (vxn * vyn) * 1_000_000).cast("long").alias("r2_ppm"),
    )


# ---------------------------------------------------------------------------
# WordPiece greedy tokenization (inference): longest-match-first over a
# fixed piece vocabulary, BERT display form ('##' marks continuations).
# The match/advance step is generated as ENGINE-NEUTRAL SQL text (substr/
# length/concat/CASE — identical semantics in Spark and DuckDB), so one
# generator feeds both the Spark withColumn chain and the oracle replay —
# the inlined-literal-fold trick the IVF cell assignment uses.
# ---------------------------------------------------------------------------

#: static piece vocabulary for the synthetic corpus: a few whole words,
#: common multi-char fragments, and every lowercase letter (so any a-z
#: word tokenizes; [UNK] covers anything else). Longest-first then
#: lexicographic — the greedy tie-break order.
WORDPIECE_VOCAB: tuple[str, ...] = tuple(
    sorted(
        {
            "scan", "join", "sort", "hash", "part", "the",
            "col", "win", "dow", "val", "mer", "que", "gro",
            "vec", "tor", "agg", "key", "ine", "tch",
            "um", "er", "ow", "or", "in", "ue", "ge", "ry", "up",
            "sh", "an", "ta", "bl", "le", "li", "ne", "st", "re",
            "am", "fa", "sl", "ba", "da", "sp", "ar", "qu", "ro",
            *"abcdefghijklmnopqrstuvwxyz",
        },
        key=lambda p: (-len(p), p),
    )
)


def wordpiece_match_sql(
    word: str, pos: str, vocab: tuple[str, ...] = WORDPIECE_VOCAB
) -> str:
    """Longest-match CASE: the first (longest, then lexicographically
    smallest) vocab piece equal to the substring of ``word`` at 1-based
    ``pos``; NULL when nothing matches ([UNK])."""
    branches = "".join(
        f" WHEN substr({word}, {pos}, {len(v)}) = '{v}' THEN '{v}'" for v in vocab
    )
    return f"CASE{branches} ELSE NULL END"


def wordpiece_step_sql(i: int, word: str = "w") -> tuple[str, str]:
    """(toks_i, pos_i) advance expressions over columns ``m{i}``,
    ``toks{i-1}``, ``pos{i-1}``: append the matched piece ('##'-marked
    past position 1) or [UNK]-and-stop; carry state once the word is
    consumed."""
    m, tp, pp = f"m{i}", f"toks{i - 1}", f"pos{i - 1}"
    sep = f"CASE WHEN {tp} = '' THEN '' ELSE ' ' END"
    cont = f"CASE WHEN {pp} > 1 THEN '##' ELSE '' END"
    toks = (
        f"CASE WHEN {pp} > length({word}) THEN {tp}"
        f" WHEN {m} IS NULL THEN concat({tp}, {sep}, '[UNK]')"
        f" ELSE concat({tp}, {sep}, {cont}, {m}) END"
    )
    pos = (
        f"CASE WHEN {pp} > length({word}) THEN {pp}"
        f" WHEN {m} IS NULL THEN length({word}) + 1"
        f" ELSE {pp} + length({m}) END"
    )
    return toks, pos


def wordpiece_tokenize_words(
    words: DataFrame,
    *,
    word_col: str = "w",
    steps: int = 10,
    vocab: tuple[str, ...] = WORDPIECE_VOCAB,
) -> DataFrame:
    """Greedy WordPiece over a word column: returns (word, pieces,
    n_pieces) with pieces space-joined in BERT display form.

    Arrow-batched tokenizer (round 10): the input is the DISTINCT word
    table (bounded by vocabulary, never corpus-sized), and the
    ``steps``-stage unrolled expression fold this replaces cost ~2 s of
    Catalyst analysis per invocation — the generated CASE tree is
    O(steps · |vocab|) and dominated every consumer's wall while the
    executors sat idle (round-10 stage profile: ≤0.5 s of task time
    under a 2.6 s query). The greedy control flow, step cap, and
    tie-breaks replicate the expression form exactly
    (``wordpiece_tokenize_words_expr``, kept as the oracle generator's
    twin), pinned bit-identical by test_wordpiece_arrow_matches_expr.
    The matcher tables build once per task (guide §4.5)."""
    by_len: dict[int, set[str]] = {}
    for v in vocab:
        by_len.setdefault(len(v), set()).add(v)
    lens = sorted(by_len, reverse=True)

    def tok(batches):
        import pandas as pd

        for pdf in batches:
            out_p: list = []
            out_n: list = []
            for w in pdf[word_col]:
                if w is None:
                    out_p.append(None)
                    out_n.append(None)
                    continue
                toks: list[str] = []
                pos, wl = 1, len(w)
                for _ in range(steps):
                    if pos > wl:
                        break
                    m = None
                    for k in lens:
                        cand = w[pos - 1 : pos - 1 + k]
                        if cand in by_len[k]:
                            m = cand
                            break
                    if m is None:
                        toks.append("[UNK]")
                        pos = wl + 1
                    else:
                        toks.append(("##" if pos > 1 else "") + m)
                        pos += len(m)
                pieces = " ".join(toks)
                out_p.append(pieces)
                out_n.append(pieces.count(" ") + 1)
            yield pd.DataFrame(
                {
                    "word": pdf[word_col],
                    "pieces": pd.Series(out_p, dtype="object"),
                    "n_pieces": pd.Series(out_n, dtype="object"),
                }
            )

    return words.mapInPandas(
        tok, schema="word string, pieces string, n_pieces long"
    )


def wordpiece_tokenize_words_expr(
    words: DataFrame,
    *,
    word_col: str = "w",
    steps: int = 10,
    vocab: tuple[str, ...] = WORDPIECE_VOCAB,
) -> DataFrame:
    """The unrolled expression form of ``wordpiece_tokenize_words`` —
    ``steps`` chained match/advance stages, one shuffle-free codegen
    projection. Kept as the reference twin of the oracle replay (same
    generated SQL fragments) and as the bit-identity pin for the Arrow
    tokenizer; not on the query path since round 10 (its O(steps ·
    |vocab|) CASE tree costs ~2 s of Catalyst analysis per
    invocation)."""
    out = words.withColumn("toks0", F.lit("")).withColumn("pos0", F.lit(1))
    for i in range(1, steps + 1):
        out = out.withColumn(
            f"m{i}", F.expr(wordpiece_match_sql(word_col, f"pos{i - 1}", vocab))
        )
        toks, pos = wordpiece_step_sql(i, word_col)
        out = out.withColumn(f"toks{i}", F.expr(toks)).withColumn(
            f"pos{i}", F.expr(pos)
        )
    t = f"toks{steps}"
    return out.select(
        F.col(word_col).alias("word"),
        F.col(t).alias("pieces"),
        F.expr(
            f"CAST(length({t}) - length(replace({t}, ' ', '')) + 1 AS BIGINT)"
        ).alias("n_pieces"),
    )


def wordpiece_oracle_sql(
    *, steps: int = 10, vocab: tuple[str, ...] = WORDPIECE_VOCAB
) -> str:
    """DuckDB replay of ``wordpiece_tokenize_words`` over the distinct
    words of ``documents.text`` — the identical generated step
    expressions threaded through chained CTEs (each referenced once:
    linear expansion, no materialization needed)."""
    ctes = [
        "wp_w AS (SELECT DISTINCT t AS w FROM (SELECT unnest(string_split(text,"
        " ' ')) AS t FROM documents) WHERE t <> '')",
        "lvl0 AS (SELECT w, CAST('' AS VARCHAR) AS toks0, 1 AS pos0 FROM wp_w)",
    ]
    for i in range(1, steps + 1):
        ctes.append(
            f"lvl{i}a AS (SELECT *, "
            f"{wordpiece_match_sql('w', f'pos{i - 1}', vocab)} AS m{i} "
            f"FROM lvl{i - 1})"
        )
        toks, pos = wordpiece_step_sql(i, "w")
        ctes.append(
            f"lvl{i} AS (SELECT w, {toks} AS toks{i}, {pos} AS pos{i} "
            f"FROM lvl{i}a)"
        )
    t = f"toks{steps}"
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT w AS word, {t} AS pieces, "
        f"CAST(length({t}) - length(replace({t}, ' ', '')) + 1 AS BIGINT)"
        f" AS n_pieces FROM lvl{steps}"
    )
