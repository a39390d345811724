"""Scalar quantization (SQ8) of embedding columns — the memory/IO
scale path for a 100 TB vector store.

A float32 64-dim embedding is 256 bytes; its SQ8 code array is 64
bytes (and packs to 64 *bits per dimension byte* on disk via parquet's
byte-stream split). At cluster scale the quantized corpus is what the
ANN candidate scan actually reads — 4× less IO, 4× more vectors per
executor page — while the exact float vectors are only fetched for the
final re-rank of a few hundred candidates (the composition
``sq_topk → exact re-rank`` mirrors FAISS's ``SQ8,Flat`` refine
pattern; Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 §III.A discusses the scalar baseline).

Everything here is engine-exact so a SQL oracle replays it bit for
bit, with the same technique the k-means trainer uses
(``similarity.train_centroids``): coordinates are scaled to integer
units of 1e-7 (scale-0 rounding of an identical IEEE product — both
engines resolve it identically), and every division is a
floor-division of provably-representable nonnegative integers, so the
double-division + floor Spark evaluates equals the ``//`` DuckDB
evaluates:

- ``code = ((v7 - mn) * 255) // (mx - mn)`` — numerator ≤ ~2.8e9
  (exact in double), true quotient is p/q with q ≤ ~1.1e7, so any
  non-integer quotient sits ≥ 1/q ≈ 9e-8 from an integer while the
  double division error is < 3e-14: ``floor`` cannot misround.
- dequantized 1e-4-unit ints: ``deq4 = (mn*255 + code*(mx-mn) + SHIFT)
  // 255000 - SHIFT//255000`` with ``SHIFT = 2_550_000_000`` keeping
  the numerator nonnegative (embeddings live in [-1, 1] ⇒ ``v7`` ≥
  -2.55e9), so truncating and flooring division agree in both engines.
- quantized score = Σ ``deq4_q · deq4_c`` — per-dim ≤ ~1.1e8, 64 dims
  ⇒ ≤ ~7e9, exact in BIGINT. No floats anywhere after encoding.

Plan shape (pinned in ``tests/test_plans.py``): stats is ONE
partial-aggregable scan collapsing to a single row (128 min/max
columns — the shuffle carries one row per partition); encoding is a
projection under a broadcast join of that row; search broadcasts the
query codes and aggregates per-query top-k. The corpus is never
shuffled by the encoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from decaton_spark.functions.similarity import EMB

#: integer units per 1.0 of embedding coordinate (matches train_centroids)
UNIT7 = 10_000_000
#: keeps dequantization numerators nonnegative for |v| ≤ 1.0
SHIFT = 255 * UNIT7  # 2_550_000_000; SHIFT // 255000 == 10_000
LEVELS = 255


def _v7(col):
    """Embedding coordinate in exact 1e-7 integer units."""
    return F.round(col.cast("double") * F.lit(float(UNIT7))).cast("long")


def sq_stats(df: DataFrame, *, vec_col: str = EMB) -> DataFrame:
    """Per-dimension [min, max] of the corpus in 1e-7 integer units,
    as one row ``(min7: array<long>, max7: array<long>)``.

    posexplode → 64-group partial-aggregable groupBy: map-side combine
    collapses each task to ≤64 rows before the shuffle regardless of
    corpus size, and the generated code is a loop (wide per-dimension
    agg columns would blow the JVM's 64 KB codegen method limit and
    drop the whole stage to interpreted mode). The result is the
    quantizer's trained parameter — persist it next to the corpus like
    the IVF centroid store and reuse across queries.
    """
    per_dim = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min(_v7(F.col("val"))).alias("mn"), F.max(_v7(F.col("val"))).alias("mx"))
    )
    packed = per_dim.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("mn"), F.col("mx")))
        ).alias("s")
    )
    return packed.select(
        F.transform(F.col("s"), lambda s: s["mn"]).alias("min7"),
        F.transform(F.col("s"), lambda s: s["mx"]).alias("max7"),
    )


def _zip_fields(vec_col: str):
    """arrays_zip struct accessors for (coordinate, min7, max7)."""

    def fields(s):
        v7 = F.round(s[vec_col].cast("double") * F.lit(float(UNIT7))).cast("long")
        mn = s["min7"]
        rng = s["max7"] - mn
        code = (
            F.when(rng == 0, F.lit(0).cast("long"))
            .otherwise(F.floor(((v7 - mn) * F.lit(LEVELS)).cast("double") / rng.cast("double")))
            .cast("long")
        )
        return v7, mn, rng, code

    return fields


def sq_encode(
    df: DataFrame,
    stats: DataFrame,
    *,
    vec_col: str = EMB,
    code_col: str = "codes",
    deq_col: str = "deq4",
) -> DataFrame:
    """Attach SQ8 codes (0..255 per dimension) and their dequantized
    1e-4-unit integer values.

    A narrow projection under a broadcast join of the one-row stats
    frame — the corpus never shuffles. ``code_col`` is what a real
    deployment persists (int8 storage); ``deq_col`` is the integer
    reconstruction used by the symmetric quantized score. Built with
    ``arrays_zip`` + ``transform`` so codegen emits a loop, not 128
    inlined element expressions (which would exceed the JVM's 64 KB
    method limit and fall back to interpreted evaluation).
    """
    fields = _zip_fields(vec_col)

    def code_fn(s):
        return fields(s)[3]

    def deq_fn(s):
        _, mn, rng, code = fields(s)
        num = (mn * F.lit(LEVELS) + code * rng + F.lit(SHIFT)).cast("double")
        return F.floor(num / F.lit(255000.0)).cast("long") - F.lit(SHIFT // 255000)

    zipped = F.arrays_zip(F.col(vec_col), F.col("min7"), F.col("max7"))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", zipped)
        .select(
            *df.columns,
            F.transform(F.col("_z"), code_fn).alias(code_col),
            F.transform(F.col("_z"), deq_fn).alias(deq_col),
        )
    )


def sq_score(q_deq, c_deq):
    """Symmetric quantized inner product: Σ deq4_q·deq4_c (exact BIGINT)."""
    return F.aggregate(
        F.zip_with(q_deq, c_deq, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = EMB,
) -> DataFrame:
    """Top-k by symmetric SQ8 inner product — the quantized-scan half
    of an SQ,Refine retrieval stack.

    The quantizer is trained on (min/max of) the corpus; both sides
    are encoded with it. Queries are tiny and broadcast; the corpus
    side is the 4×-smaller code scan. One shuffle: the per-query
    top-k. Ties break to the lowest neighbor id, so ranks are
    engine-stable.

    Returns ``(query_id, rank, neighbor_id, ip4)`` with ``ip4`` the
    exact integer score in 1e-8 units-squared.
    """
    # Train once, materialize the (tiny) quantizer, re-literalize: both
    # encode sides would otherwise re-evaluate the stats subtree — two
    # full corpus scans instead of one (the trained_centroids pattern).
    mn, mx = sq_stats(corpus, vec_col=vec_col).select("min7", "max7").first()
    stats = corpus.sparkSession.range(1).select(
        F.array(*[F.lit(int(v)) for v in mn]).alias("min7"),
        F.array(*[F.lit(int(v)) for v in mx]).alias("max7"),
    )
    c = sq_encode(corpus, stats, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("deq4").alias("_cd")
    )
    q = sq_encode(queries, stats, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col("deq4").alias("_qd")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        sq_score(F.col("_qd"), F.col("_cd")).alias("ip4"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ip4").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "ip4")
    )


def sq_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = EMB,
    num_partitions: int | None = None,
) -> DataFrame:
    """``sq_topk``, numpy-vectorized scoring: the compute-bound scale
    path (the ``brute_force_topk_vectorized`` pattern applied to the
    quantized scan).

    Quantization is IDENTICAL — the same trained-stats literal and the
    same native ``sq_encode`` projection produce the integer ``deq4``
    arrays — so only the pair scoring changes: each ``mapInPandas``
    batch computes a (batch × queries) int64 matmul against the
    broadcast encoded query matrix and emits its local top-k per
    query, so the shuffle carries k rows per (query, partition)
    instead of the |corpus|×|queries| scored pairs whose per-pair
    ``aggregate(zip_with)`` fold runs interpreted (the sf0.1-×100
    ladder charged 31.6 s to that fold). Integer matmul is exact, so
    results are bit-identical to ``sq_topk`` (pinned in
    tests/test_quantize.py); ties break to the lowest neighbor id.

    ``num_partitions`` hash-spreads the corpus by id before the stats
    scan and the Arrow scoring stage: ``mapInPandas`` inherits the
    input partitioning, so on a source with fewer scan splits than
    cores the matmul towers otherwise collapse to the split count
    (round-9 stage audit: single-task towers at sf0.1). Results are
    partitioning-independent — the per-partition local top-k is a
    superset filter and the final window re-ranks globally.
    """
    import numpy as np

    if num_partitions:
        corpus = corpus.repartition(num_partitions, id_col)

    mn, mx = sq_stats(corpus, vec_col=vec_col).select("min7", "max7").first()
    stats = corpus.sparkSession.range(1).select(
        F.array(*[F.lit(int(v)) for v in mn]).alias("min7"),
        F.array(*[F.lit(int(v)) for v in mx]).alias("max7"),
    )
    q_rows = (
        sq_encode(queries, stats, vec_col=vec_col)
        .select(F.col(id_col).alias("query_id"), "deq4")
        .collect()
    )  # query set is tiny (broadcast model state, not data rows)
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r["deq4"]) for r in q_rows], dtype=np.int64)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    c = sq_encode(corpus, stats, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "deq4"
    )
    out_schema = "query_id long, neighbor_id long, ip4 long"

    def score(batches):
        import pandas as pd

        ids, mat = bc.value
        for pdf in batches:
            c_ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["deq4"]), dtype=np.int64)
            ip = c_mat @ mat.T  # exact: int64 all the way
            parts = []
            for j, qid in enumerate(ids):
                col = ip[:, j]
                mask = c_ids != qid
                cand_ids, cand_ip = c_ids[mask], col[mask]
                idx = np.lexsort((cand_ids, -cand_ip))
                if len(idx) > k:  # local top-k prune before shuffle
                    idx = idx[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[idx],
                            "ip4": cand_ip[idx],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    scored = c.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("ip4").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "ip4")
    )


def binary_signature(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = EMB,
) -> DataFrame:
    """1-bit-per-dimension binary signature: the 32× compression rung
    below SQ8 (sign bit of each coordinate, packed into two 32-bit
    halves carried as BIGINTs — bit 63 of a single word would wrap the
    sign differently across engines, two unsigned halves cannot).

    Sign is taken on the 1e-7 integer unit (``round(v·1e7) > 0``), the
    same snap every other cross-engine op uses, so the bit pattern is
    engine-exact even for coordinates within an ulp of zero. Encoding
    is a pure projection; at 100 TB the signature column is 8 bytes
    against 256 — the candidate scan for a Hamming-then-exact-rerank
    retrieval stack.
    """

    def half(start: int):
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda i: F.when(
                    _v7(F.col(vec_col)[i + start]) > 0,
                    F.pow(F.lit(2.0), i.cast("double")).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return df.select(
        F.col(id_col), half(0).alias("h1"), half(32).alias("h2")
    )


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = EMB,
) -> DataFrame:
    """Top-k by Hamming distance between binary signatures — the
    cheapest ANN scan in the family (XOR + popcount per candidate,
    JVM-side `bit_count`). Broadcast queries, unshuffled corpus, one
    per-query top-k window; ties → lowest neighbor id.

    Returns (query_id, rank, neighbor_id, hamming).
    """
    c = binary_signature(corpus, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("h1").alias("c1"),
        F.col("h2").alias("c2"),
    )
    q = binary_signature(queries, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("q2"),
    )
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        (
            F.bit_count(F.col("q1").bitwiseXOR(F.col("c1")))
            + F.bit_count(F.col("q2").bitwiseXOR(F.col("c2")))
        )
        .cast("long")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "hamming")
    )
