"""Corpus-level deterministic sampling policies.

Temperature-scaled mixture (XLM-R-style α = 1/2 language rebalancing)
as a reusable stage: compute per-language keep cutoffs from the corpus
itself, apply them as a deterministic md5-threshold test. Everything is
integer-exact (see the α = 1/2 / correctly-rounded-sqrt rationale in
``queries.docs_temperature_mixture``), so the DuckDB oracle replays the
kept set bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from decaton_spark.functions.hashing import md5_long

#: the doc_id hash fragment both engines share (salt 'tmix|')
TEMP_HASH_SPARK = md5_long("CAST(doc_id AS STRING)", 8, salt="tmix|")


def temperature_cutoffs(
    d: DataFrame, *, divisor: int = 3
) -> DataFrame:
    """Per-language integer keep cutoffs (0..2^32] for an α = 1/2
    temperature mixture over a (lang, n_tokens) frame: language ``l``
    gets budget share sqrt(c_l)/Σ sqrt(c_k) of a corpus_tokens/divisor
    token budget. DECIMAL(38,0) intermediates — budget·w·2^32 passes
    2^63 beyond ~10M corpus tokens. Returns (lang, cutoff)."""
    per_lang = d.groupBy("lang").agg(F.sum("n_tokens").alias("c"))
    weighted = per_lang.select(
        "lang", "c",
        F.floor(F.sqrt(F.col("c").cast("double"))).cast("long").alias("w"),
    )
    denom = weighted.agg(
        F.sum("w").alias("den"),
        F.expr(f"sum(c) DIV {divisor}").alias("budget"),
    )
    return weighted.crossJoin(F.broadcast(denom)).select(
        "lang",
        F.least(
            F.lit(4294967296).cast("long"),
            F.expr(
                "CAST((CAST(budget AS DECIMAL(38,0)) * w * 4294967296)"
                " div (CAST(den AS DECIMAL(38,0)) * c) AS BIGINT)"
            ),
        ).alias("cutoff"),
    )


def temperature_mixture_summary(
    df: DataFrame,
    *,
    text_col: str = "text",
    divisor: int = 3,
) -> DataFrame:
    """Apply the temperature mixture to a (doc_id, lang, text) corpus
    and report per language: (cutoff, n_docs_kept, tokens_kept). Plan:
    two scans + a broadcast of |langs| cutoffs, one filtered
    partial-agg groupBy — no sort, no RNG."""
    d = df.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        F.expr(TEMP_HASH_SPARK).alias("hv"),
    )
    thresh = temperature_cutoffs(d, divisor=divisor)
    kept = d.join(F.broadcast(thresh), "lang")
    keep = F.col("hv") < F.col("cutoff")
    return (
        kept.groupBy("lang", "cutoff")
        .agg(
            F.count(F.when(keep, 1)).alias("n_docs_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
        )
        .select(
            "lang",
            F.col("cutoff").cast("long").alias("cutoff"),
            "n_docs_kept",
            "tokens_kept",
        )
    )
