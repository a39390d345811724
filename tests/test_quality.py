"""Unit + plan tests for functions/quality.py (Gopher/C4 filters, PII).

The DuckDB oracle replay is covered by tests/test_queries_oracle.py via
the docs_gopher_filter / docs_pii_redact registrations; these tests pin
the edge-case semantics the oracle data may not hit, and the plan shape
(one shuffle-free scan).
"""

from __future__ import annotations

import pytest

from decaton_spark.functions import quality as ql

from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def verdicts(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "lonetoken"),
        (5, "a b"),  # 2 tokens: bigram path, too_short
        (6, "the quick brown fox jumps over the lazy dog again tonight ok"),
        (7, "spam " * 30),  # trailing space; 30 tokens, repetitive
        (8, "aa aa aa bb cc dd ee ff gg hh"),  # dominated
        (9, "a b c d e f g h i j k l"),  # token_len (mean 1.0)
        (10, "  pad   ded    tokens " + "word " * 9),  # whitespace runs
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = ql.gopher_filter(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_null_document_gets_null_verdict(verdicts):
    v = verdicts[1]
    assert v["quality_verdict"] == "null"
    assert v["n_tokens"] is None
    assert v["dup_token_frac"] is None
    assert v["dup_bigram_frac"] is None
    assert v["top_token_frac"] is None
    assert v["mean_token_len"] is None


def test_empty_and_whitespace_docs_are_zero_tokens(verdicts):
    for doc in (2, 3):
        assert verdicts[doc]["n_tokens"] == 0
        assert verdicts[doc]["quality_verdict"] == "too_short"
        # no bigrams, no dup — and no crash from sequence(1, -1)
        assert verdicts[doc]["dup_bigram_frac"] == 0.0


def test_single_token_doc_does_not_crash_bigrams(verdicts):
    v = verdicts[4]
    assert v["n_tokens"] == 1
    assert v["quality_verdict"] == "too_short"
    assert v["dup_bigram_frac"] == 0.0
    assert v["top_token_frac"] == 1.0


def test_verdict_battery(verdicts):
    assert verdicts[5]["quality_verdict"] == "too_short"
    assert verdicts[6]["quality_verdict"] == "keep"
    assert verdicts[7]["quality_verdict"] == "repetitive"
    assert verdicts[8]["quality_verdict"] == "dominated"
    assert verdicts[9]["quality_verdict"] == "token_len"


def test_whitespace_runs_do_not_inflate_counts(verdicts):
    # 'spam ' * 30 has a trailing space: exactly 30 tokens, not 31
    assert verdicts[7]["n_tokens"] == 30
    assert verdicts[7]["dup_token_frac"] == round(29 / 30, 6)
    # doc 10: runs of spaces collapse; 3 + 9 = 12 tokens
    assert verdicts[10]["n_tokens"] == 12
    # mean token length from the token array (pad=3,ded=3,tokens=6,word=4*9)
    assert verdicts[10]["mean_token_len"] == round((3 + 3 + 6 + 4 * 9) / 12, 6)


def test_top_token_frac_values(verdicts):
    # doc 8: 'aa' appears 3 times in 10 tokens
    assert verdicts[8]["top_token_frac"] == 0.3
    assert verdicts[8]["dup_token_frac"] == 0.2
    # doc 7: all 30 tokens identical
    assert verdicts[7]["top_token_frac"] == 1.0


def test_pii_redaction_counts_and_text(spark):
    rows = [
        (1, "mail a@b.co and c.d+e@f-g.org now"),
        (2, "ip 8.8.8.8 and 255.255.255.255"),
        (3, "tel +1-555-123-4567 or +82-1234-5678 end"),
        (4, "no pii here"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in ql.pii_redact(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 0, 0)
    assert out[1]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert out[2]["n_ips"] == 2
    assert out[2]["redacted"] == "ip <IP> and <IP>"
    # both 3-group and 2-group international formats redact
    assert out[3]["n_phones"] == 2
    assert out[3]["redacted"] == "tel <PHONE> or <PHONE> end"
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[5]["n_emails"] is None and out[5]["redacted"] is None


def test_quality_battery_is_one_shuffle_free_scan(spark, sf_dir):
    """100 TB contract: the whole filter battery (stats + verdict) is a
    narrow projection — no Exchange, no Python UDF in the plan."""
    from decaton_spark.queries import EXTRA_QUERIES, QUERIES

    all_q = {**QUERIES, **EXTRA_QUERIES}
    for name in ("docs_gopher_filter", "docs_pii_redact"):
        p = plan_of(all_q[name].fn(spark, sf_dir))
        assert "Exchange" not in p, f"{name} must not shuffle:\n{p}"
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_decontaminate_flags_ngram_overlap(spark):
    """Docs sharing an n-gram with the benchmark are flagged with the
    DISTINCT overlapping gram count; clean docs are absent."""
    from decaton_spark.functions.quality import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a the quick brown fox runs"),   # shares 'the quick brown' + 'quick brown fox'
            (2, "totally clean document here"),
            (3, "the quick brown the quick brown"),  # dup gram counts once
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    assert out == {1: 2, 3: 1}


def test_bloom_decontaminate_supersets_exact(spark):
    """The Bloom variant may over-flag (false positives) but must never
    under-flag: every doc the exact n-gram join flags is flagged with
    at least the exact overlap count; with a roomy bitmap the results
    are identical."""
    from decaton_spark.functions.quality import bloom_decontaminate, decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a the quick brown fox runs"),
            (2, "totally clean document here"),
            (3, "the quick brown the quick brown"),
        ],
        "doc_id long, text string",
    )
    exact = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged_ngrams"]
        for r in bloom_decontaminate(
            corpus, bench, n=3, m_bits=16384, k=3
        ).collect()
    }
    for doc_id, n_exact in exact.items():
        assert bloom.get(doc_id, 0) >= n_exact, "Bloom false negative"
    # 3 grams into 16384 bits: collision-free, so exactly the exact set
    assert bloom == exact


def test_bloom_bitmap_shape_and_reuse(spark):
    """build_bloom_bitmap returns m_bits/32 packed non-negative words;
    passing it back as `bitmap` skips the build and gives the same
    answer (the offline-index usage)."""
    from decaton_spark.functions.quality import (
        bloom_decontaminate,
        build_bloom_bitmap,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a the quick brown fox runs")], "doc_id long, text string"
    )
    bm = build_bloom_bitmap(bench, n=3, m_bits=4096, k=3)
    assert len(bm) == 4096 // 32
    assert all(0 <= w < (1 << 32) for w in bm)
    assert sum(bin(w).count("1") for w in bm) == 9  # 3 grams x 3 hashes, no collision
    inline = bloom_decontaminate(corpus, bench, n=3, m_bits=4096, k=3).collect()
    reused = bloom_decontaminate(
        corpus, bench, n=3, m_bits=4096, k=3, bitmap=bm
    ).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, reused))


def test_novelty_semantics_and_plan(spark):
    """An exact copy of an earlier document scores 0 novelty; the
    earliest document scores 1000; a half-overlapping document lands
    strictly between. The election must be a partial-aggregable
    min-per-gram (HashAggregate), never a per-gram window sort."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact copy of 1
        (3, "alpha beta gamma delta nu xi omicron pi rho sigma"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in ql.novelty_stats(df, n=3).collect()}
    assert out[1]["novelty_pml"] == 1000
    assert out[2]["novelty_pml"] == 0 and out[2]["novel_grams"] == 0
    assert 0 < out[3]["novelty_pml"] < 1000
    # doc 3 shares exactly the grams of "alpha beta gamma delta": 2
    # 3-grams ("alpha beta gamma", "beta gamma delta") of its 8
    assert out[3]["n_grams"] == 8 and out[3]["novel_grams"] == 6

    p = plan_of(ql.novelty_stats(df, n=3))
    assert "Window" not in p, "first-seer election must not window-sort"
    assert "partial_min" in p or "partial_count" in p
    assert "CartesianProduct" not in p


def test_novelty_null_and_empty_text(spark):
    """Round-9 adversarial pin (the restructure away from the h
    join-back made this reachable): NULL-text docs must stay EXCLUDED
    — in the old plan their NULL gram hash fell out of the equi-join;
    the registered oracle (md5(gram) JOIN USING h) does the same —
    while empty-text docs keep their single ''-shingle row. Without
    the explicit NULL filter the new aggregation-only plan resurrected
    NULL-text docs with novelty 1000 (caught live in round 9)."""
    rows = [(1, "alpha beta gamma delta"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in ql.novelty_stats(df, n=3).collect()}
    assert 2 not in out, "NULL-text doc must not appear"
    assert out[1]["n_grams"] == 2 and out[1]["novelty_pml"] == 1000
    assert out[3]["n_grams"] == 1  # the single clamped '' shingle


def test_ccnet_buckets_per_lang_tertiles(spark):
    """Tertile assignment is per-language by score rank (head = highest
    mean log-prob), bucket sizes follow ntile's remainder rule, and the
    micro-mean is the exact floor of the bucket's score sum / count."""
    from decaton_spark.functions import quality as ql

    # lang 'a': 4 docs with clearly ordered LM scores (repeated common
    # token 'x' scores high; rare singletons score low); lang 'b': 2 docs
    rows = [
        (1, "x x x x", "a"),
        (2, "x x r1", "a"),
        (3, "x r2 r3", "a"),
        (4, "r4 r5 r6", "a"),
        (5, "x x", "b"),
        (6, "r7 r8", "b"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string, lang string")
    out = {(r["lang"], r["bucket"]): r for r in ql.ccnet_buckets(df).collect()}
    # lang a: ntile(3) over 4 rows -> sizes 2,1,1; doc1+doc2 are head
    assert out[("a", "head")]["n_docs"] == 2
    assert out[("a", "middle")]["n_docs"] == 1
    assert out[("a", "tail")]["n_docs"] == 1
    assert out[("a", "head")]["total_tokens"] == 7
    # lang b: 2 rows -> head and middle only, no tail bucket
    assert out[("b", "head")]["n_docs"] == 1
    assert out[("b", "middle")]["n_docs"] == 1
    assert ("b", "tail") not in out
    # ordering sanity: head scores above tail (less negative micro mean)
    assert out[("a", "head")]["mean_logprob_micro"] > out[("a", "tail")]["mean_logprob_micro"]
