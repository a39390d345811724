"""Equivalence pins for the round-6 n-gram expression rewrites.

``word_shingles`` and the bigram builders (repetition_stats,
lm_score_bigram, collocations) moved from
``transform(sequence(...), i -> element_at/slice ...)`` (interpreted
per-element lambda) to offset-slice ``zip_with``/``arrays_zip`` forms —
3-8x faster for what must be BIT-IDENTICAL output. The full-corpus
row-for-row check ran once before the switch; these tests pin the
equivalence permanently on the adversarial inputs a fixture corpus may
not contain: NULL text, empty string, whitespace runs (empty tokens),
single token, exactly k / k-1 / k+1 tokens, and both sides of the
k=12/13 implementation boundary inside word_shingles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from decaton_spark.functions.dedup import word_shingles

EDGE_ROWS = [
    (1, None),
    (2, ""),
    (3, " "),                      # one empty token pair
    (4, "   "),                    # run of empty tokens
    (5, "solo"),
    (6, "a b"),
    (7, "a b c"),
    (8, "a b c d"),
    (9, "x " * 9 + "x"),           # 10 tokens
    (10, "x " * 10 + "x"),         # 11 tokens
    (11, "x " * 12 + "y"),         # 13 tokens (13-gram boundary)
    (12, "dup dup dup dup"),       # distinct-collapse
    (13, "a  b   c"),              # interior empty tokens
    (14, " lead trail "),          # leading/trailing empties
]


def _old_shingles(text_col: str, k: int):
    """The pre-round-6 construction, verbatim — the semantic oracle."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), "\x1f"))
    )


def _old_bigram_strings(text_col: str):
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _old_bigram_structs(text_col: str):
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("prev"),
                F.element_at(toks, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))


def _new_bigram_strings(text_col: str):
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))


# the struct-pair form is the PRODUCTION helper itself (text.py
# bigram_pairs, consumed by lm_score_bigram and text_collocations_pmi)
# — testing a local copy would let the real expression drift unpinned


@pytest.fixture(scope="module")
def edge_docs(spark):
    return spark.createDataFrame(EDGE_ROWS, schema="doc_id long, text string")


def _assert_identical(df, old_col, new_col):
    bad = (
        df.select(
            "doc_id", old_col.alias("old"), new_col.alias("new")
        )
        .filter(~F.expr("old <=> new"))
        .collect()
    )
    assert bad == [], f"rewrite diverges from the old form: {bad}"


# k sweep crosses every shape boundary: k=1 (degenerate), 2/3/5 (fold
# path), 11/12 (last fold ks — the cutoff sits at the measured k=13
# crossover, ADVICE r6), 13 (first slice k; the production 13-gram
# decontamination width)
@pytest.mark.parametrize("k", [1, 2, 3, 5, 10, 11, 12, 13])
def test_word_shingles_matches_old_form(edge_docs, k):
    _assert_identical(
        edge_docs, _old_shingles("text", k), word_shingles("text", k)
    )


def test_bigram_strings_match_old_form(edge_docs):
    # construction identity on plain-split arrays; the PRODUCTION
    # string-bigram (repetition_stats, which tokenizes via
    # quality._toks — trim + whitespace-run + empty-filter) is pinned
    # behaviorally by test_repetition_stats_edge_rows below, whose
    # rows include the whitespace-run shapes _toks normalizes
    _assert_identical(
        edge_docs, _old_bigram_strings("text"), _new_bigram_strings("text")
    )


def test_bigram_structs_match_old_form(edge_docs):
    from decaton_spark.functions.text import bigram_pairs

    _assert_identical(
        edge_docs, _old_bigram_structs("text"), bigram_pairs("text")
    )


def test_repetition_stats_edge_rows(spark, edge_docs):
    """The quality-battery consumer of the bigram rewrite: NULL text
    keeps NULL stats, <2-token docs get 0-bigram semantics (dup frac
    NULL via the n_bi > 0 guard), duplicates count exactly."""
    from decaton_spark.functions.quality import repetition_stats

    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(edge_docs).collect()
    }
    assert out[1]["dup_bigram_frac"] is None  # NULL text
    assert out[5]["dup_bigram_frac"] == 0.0  # 1 token: no bigrams ⇒ 0.0
    # "dup dup dup dup": 3 bigrams, all identical -> (3-1)/3
    assert out[12]["dup_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)


def test_hex_to_long_spark_matches_portable_form(spark):
    """Round-8 rewrite pin: hex_to_long_spark (one native conv()) must
    be bit-identical to the portable instr/substr digit sum the DuckDB
    oracle replays — across every band offset, digit width the engine
    uses, NULL input, and the extreme digests. The minhash band-min
    ran 2.6x faster under conv; a single differing value would silently
    re-bucket LSH candidates."""
    from decaton_spark.functions.hashing import hex_to_long, hex_to_long_spark

    rows = [
        ("00000000000000000000000000000000",),
        ("ffffffffffffffffffffffffffffffff",),
        ("0123456789abcdef0123456789abcdef",),
        ("deadbeefdeadbeefdeadbeefdeadbeef",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "h string")
    # the (start, ndigits) shapes used across the engine: 4 bands x 8
    # digits (minhash/simhash/bloom), 4 (h16), 12 (sampling hashes)
    shapes = [(1 + 8 * b, 8) for b in range(4)] + [(1, 4), (1, 12)]
    cols = []
    for start, nd in shapes:
        cols.append(F.expr(hex_to_long("h", start, nd)).alias(f"p_{start}_{nd}"))
        cols.append(
            F.expr(hex_to_long_spark("h", start, nd)).alias(f"s_{start}_{nd}")
        )
    out = df.select(*cols)
    bad = out.filter(
        " OR ".join(
            f"NOT (p_{start}_{nd} <=> s_{start}_{nd})" for start, nd in shapes
        )
    )
    assert bad.count() == 0

    with pytest.raises(ValueError):
        hex_to_long_spark("h", 1, 16)  # conv wraps unsigned past 15 digits


def test_minhash_signature_matches_portable_form(spark):
    """End-to-end pin on the consumer: minhash_signature values over
    the edge corpus (NULL/empty/whitespace/short docs) are identical
    under the conv form and the portable digit-sum form."""
    from decaton_spark.functions.dedup import minhash_signature, word_shingles
    from decaton_spark.functions.hashing import hex_to_long

    df = (
        spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
        .withColumn("shingles", word_shingles("text", 3))
        .withColumn("hashes", F.expr("transform(shingles, s -> md5(s))"))
    )
    portable = [
        F.expr(
            f"array_min(transform(hashes, "
            f"h -> {hex_to_long('h', start=1 + 8 * b, ndigits=8)}))"
        ).alias(f"p{b}")
        for b in range(4)
    ]
    out = df.select(*minhash_signature("hashes", 4), *portable)
    bad = out.filter(
        " OR ".join(f"NOT (minhash_{b} <=> p{b})" for b in range(4))
    )
    assert bad.count() == 0
