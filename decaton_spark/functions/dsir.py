"""Data selection via importance resampling (DSIR-style domain scoring).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169) select pretraining documents by how
target-domain-like they are: an importance weight from the likelihood
ratio of the document under a target-domain n-gram model vs a
background model. This module computes the token-level form as pure
DataFrame aggregations:

- **vocab build** (one corpus scan): per-token background count and
  target count from a single groupBy (the target flag rides along, so
  both models come out of one shuffle);
- **scoring** (one corpus scan): explode tokens, broadcast-join the
  vocab's per-token Laplace-smoothed likelihood ratio, average per
  document.

Determinism contract (so the DuckDB oracle hash-matches): per-token
ratios are plain divisions of exactly-represented integer-derived
doubles — no ``log``/``exp`` whose libm implementations differ by an
ulp across engines. The per-document mean sums ratios as scaled
integers (DECIMAL — associative, order-independent) and divides once.
The paper's log-likelihood-ratio form orders documents identically for
resampling whenever token ratios are positive (log is monotone on the
per-token factor; the arithmetic-vs-geometric mean difference is a
documented deviation, traded for bit-exact reproducibility).

Scale notes: the vocab is Zipf-distributed — ``min_count`` prunes the
singleton tail so the broadcast stays small (pruned tokens fall back
to the OOV-smoothed ratio, exactly as unseen tokens do); both corpus
scans are narrow (doc_id, text) projections; the two shuffles
(by token, by doc_id) are partial-aggregable. For repeated scoring
runs, persist the vocab frame like the centroid store and skip the
build scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from decaton_spark.functions.quality import _toks



def domain_importance(
    df: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    ratio_digits: int = 6,
) -> DataFrame:
    """Score every document by its mean token likelihood ratio
    p_target(token) / p_background(token), Laplace-smoothed.

    ``target`` is a boolean Column over ``df`` rows selecting the
    target-domain exemplar documents (e.g. ``F.col("lang") == "zh"``).
    Returns ``(id_col, n_scored_tokens, importance)`` for every input
    document; ``importance`` is NULL for token-less documents and
    > 1.0 means more target-like than background. Rank by it and keep
    the top budget (or Gumbel-resample) to select data.
    """
    exploded = df.select(
        F.col(id_col),
        target.alias("is_t"),
        F.explode(_toks(text_col)).alias("token"),
    )
    bg = exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("cb"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
    )
    stats = bg.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cb").alias("nb"),
        F.sum("ct").alias("nt"),
    )
    # scaled-integer ratio via ONE scale-0 rounding of an identical
    # IEEE quotient — fractional round(x, 6) is implemented differently
    # across engines (BigDecimal decimal-expansion HALF_UP vs
    # std::round(x*1e6)/1e6) and diverges at digit boundaries; scale-0
    # rounding of the same double does not (same trick as
    # similarity.train_centroids coordinate means).
    scale_i = 10 ** ratio_digits
    scale = F.lit(float(scale_i))
    ratio6 = (
        F.round(
            ((F.col("ct") + F.lit(1.0)) * (F.col("nb") + F.col("v")))
            / ((F.col("cb") + F.lit(1.0)) * (F.col("nt") + F.col("v")))
            * scale
        ).cast("long")
    )
    vocab = (
        bg.filter(F.col("cb") >= min_count)
        .crossJoin(F.broadcast(stats))
        .select("token", ratio6.alias("r6"))
    )
    oov6 = (
        F.round(
            (F.lit(1.0) * (F.col("nb") + F.col("v")))
            / (F.lit(1.0) * (F.col("nt") + F.col("v")))
            * scale
        ).cast("long")
    )
    scored = (
        exploded.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(stats))
        .select(id_col, F.coalesce(F.col("r6"), oov6).alias("r6"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored_tokens"),
        F.sum(F.col("r6").cast("decimal(38,0)")).alias("s"),
    )
    # final mean in EXACT integer arithmetic: (2s + n) div (2n) is
    # round-half-up of s/n with no doubles involved — the double
    # quotient s/n/1e6 regularly lands on true 7-digit halves
    # (e.g. 1.0034305), where Spark's BigDecimal shortest-repr
    # rounding and DuckDB's binary-double rounding disagree. The
    # closing /1e6 of an integer is exact in both engines.
    mean_micro = F.expr(
        "(2 * CAST(s AS BIGINT) + n_scored_tokens)"
        " div (2 * n_scored_tokens)"
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_scored_tokens"), F.lit(0)).alias(
                "n_scored_tokens"
            ),
            F.when(
                F.col("n_scored_tokens") > 0,
                mean_micro.cast("double") / F.lit(float(scale_i)),
            ).alias("importance"),
        )
    )
