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
is the cheapest possible place to drop low-quality documents.

Reference parity note: the reference engine (line/decaton) has no text
operators — this module is part of the beyond-reference LLM-pipeline
surface the engine adds (SURVEY.md §7.1 "north star").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately simple, RE2/Java-compatible patterns so the DuckDB
# oracle replays them byte-for-byte ('g' flag on the DuckDB side)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
IPV4_RE = "[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?"
PHONE_RE = "\\+[0-9][0-9]?[0-9]?-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"


def _toks(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition features (Gopher §A1.1 analogues).

    - ``dup_token_frac``: 1 - distinct/total unigrams — high for
      boilerplate and keyword-stuffed pages.
    - ``dup_bigram_frac``: 1 - distinct/total bigrams — catches looped
      phrases that unigram stats miss.
    - ``top_token_frac``: share of the single most frequent token.

    All integer combinatorics with one final rounded division so the
    DuckDB oracle reproduces values exactly.
    """
    toks = _toks(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # bigrams via an index sequence: [t0 t1, t1 t2, ...]
    bigrams = F.transform(
        F.sequence(F.lit(0), n - F.lit(2)),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    n_bi = F.size(bigrams)
    n_bi_distinct = F.size(F.array_distinct(bigrams))
    # most-frequent-token count: max over distinct tokens of the
    # number of positions holding that token (array combinatorics,
    # no explode → no shuffle)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return (
        df.withColumn("n_tokens", n.cast("long"))
        .withColumn("dup_token_frac", F.round((n - n_distinct) * 1.0 / n, 6))
        .withColumn(
            "dup_bigram_frac",
            F.when(n_bi > 0, F.round((n_bi - n_bi_distinct) * 1.0 / n_bi, 6)).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn("top_token_frac", F.round(top_cnt * 1.0 / n, 6))
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
    {'keep','too_short','too_long','token_len','repetitive','dominated'}.

    The rule order is fixed so the verdict is deterministic and the
    oracle can replay it as a CASE chain.
    """
    toks = _toks(text_col)
    n = F.size(toks)
    mean_len = (F.length(F.col(text_col)) - n + 1) * 1.0 / n
    with_stats = repetition_stats(df, text_col)
    verdict = (
        F.when(n < min_tokens, F.lit("too_short"))
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
