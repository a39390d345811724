"""Generated doc indexes must match the code (tools/gen_docs.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))


def test_api_and_query_indexes_fresh():
    import gen_docs

    assert (ROOT / "API.md").read_text() == gen_docs.gen_api_md(), (
        "API.md stale — run python tools/gen_docs.py"
    )
    assert (ROOT / "QUERIES.md").read_text() == gen_docs.gen_queries_md(), (
        "QUERIES.md stale — run python tools/gen_docs.py"
    )


def test_length_bucket_boundaries_and_waste(spark):
    from decaton_spark.functions import text as tx

    rows = [
        (1, "a b c d"),          # 4 tokens -> bucket 4, zero waste
        (2, "a b c d e"),        # 5 tokens -> bucket 8
        (3, "a b c d e f g h"),  # 8 tokens -> bucket 8 (exact boundary)
        (4, "a"),                # 1 token  -> bucket 1
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["bucket"]: r for r in tx.length_bucket_stats(df).collect()}
    assert out[4]["n_docs"] == 1 and out[4]["waste_pml"] == 0
    assert out[1]["n_docs"] == 1 and out[1]["waste_pml"] == 0
    b8 = out[8]
    assert b8["n_docs"] == 2 and b8["total_tokens"] == 13
    assert b8["capacity"] == 16 and b8["padding_tokens"] == 3
    assert b8["waste_pml"] == (3 * 1000) // 16


def test_containment_catches_quote_inclusion(spark):
    """A short doc fully quoted inside a long doc: Jaccard is tiny but
    containment is 1000 per-mille; the short (later-ingested) doc is
    the contained side. A disjoint doc produces no pair."""
    from decaton_spark.functions import dedup as dd

    quote = "alpha beta gamma delta"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, filler + " " + quote),                 # the long container
        (2, quote),                                # the quote
        (3, "totally different words here now"),   # disjoint
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], schema="id_a long, id_b long"
    )
    out = dd.verify_pairs_containment(df, pairs, n=1, threshold_pml=700)
    rows_out = out.collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r["contained_id"] == 2 and r["container_id"] == 1
    assert r["containment_pml"] == 1000
    assert r["n_grams_contained"] == 4 and r["overlap"] == 4

    jacc = dd.verify_pairs_jaccard(df, pairs, n=1, threshold=0.5)
    assert jacc.count() == 0  # symmetric Jaccard misses the quote


def test_source_priority_election(spark):
    """Identical texts across sources: the preferred source wins
    regardless of id order; unknown sources lose to ranked ones;
    within a source, lowest id. (The driver fixture has no exact
    duplicates, so the election only fires on planted ones.)"""
    from decaton_spark.functions import dedup as dd

    rows = [
        (1, "same text here", "crawl"),      # unknown source, lowest id
        (2, "same text here", "curated"),    # rank 0 -> must win
        (3, "same text here", "forum"),      # rank 5
        (9, "unique text", "crawl"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string, source string")
    out = {
        r["text_hash"]: r
        for r in dd.exact_dups_by_priority(
            df, {"curated": 0, "forum": 5}
        ).collect()
    }
    dup = [r for r in out.values() if r["n_docs"] == 3][0]
    assert dup["keep_id"] == 2 and dup["keep_source"] == "curated"
    solo = [r for r in out.values() if r["n_docs"] == 1][0]
    assert solo["keep_id"] == 9 and solo["keep_source"] == "crawl"


def test_bigram_lm_rewards_repeated_phrases(spark):
    """A document whose bigrams repeat corpus-common transitions must
    outscore one with the SAME unigrams in scrambled (unseen-bigram)
    order — the signal the unigram model cannot see."""
    from decaton_spark.functions import text as tx

    common = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, common),
        (2, common),
        (3, common),
        (4, "dog the over quick lazy fox brown jumps the"),  # same bag
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.lm_score_bigram(df).collect()}
    assert out[4]["n_tokens"] == 9
    assert out[1]["avg_logprob"] > out[4]["avg_logprob"]
    # unigram model sees identical bags -> identical scores
    uni = {r["doc_id"]: r for r in tx.lm_score(df).collect()}
    assert uni[1]["avg_logprob"] == uni[4]["avg_logprob"]


def test_topic_tag_argmax_ties_and_nulls(spark):
    """Argmax by hits; ties go to the lexicographically first topic;
    zero-hit documents get NULL topic; plan is shuffle-free."""
    from decaton_spark.functions import text as tx
    from tests.test_plans import plan_of

    topics = {"b_topic": ["foo", "bar"], "a_topic": ["baz", "qux"]}
    rows = [
        (1, "foo foo bar baz"),       # b=3, a=1 -> b_topic
        (2, "foo baz"),               # 1-1 tie -> a_topic (lex first)
        (3, "nothing matches here"),  # NULL topic
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.topic_tag(df, topics).collect()}
    assert out[1]["topic"] == "b_topic" and out[1]["topic_hits"] == 3
    assert out[2]["topic"] == "a_topic" and out[2]["topic_hits"] == 1
    assert out[3]["topic"] is None and out[3]["total_hits"] == 0

    p = plan_of(tx.topic_tag(df, topics), "simple")
    assert "Exchange" not in p, "topic tagging must be a pure projection"


def test_rater_agreement_kappa_on_planted_fixture(spark, tmp_path):
    """Mixed verdicts → nonzero κ, hand-computed: a=(0,0,1,1,1),
    b=(1,0,1,1,1) ⇒ agree=4, E=14, κ = 6/11 → 545 milli. (On the
    driver fixture κ is exactly 0 — rater A has no variance, the
    intended insight that containment adds signal exact dedup lacks.)"""
    from pyspark.sql import functions as F

    from decaton_spark.queries import EXTRA_QUERIES, QUERIES

    filler = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, filler + " alpha beta gamma", "s"),   # container of 2
        (2, filler + " alpha beta gamma", "s"),   # exact dup of 1
        (3, "completely different text one x1 y1 z1 q1 r1", "s"),
        (4, "another unrelated document here x2 y2 z2 q2 r2", "s"),
        (5, "third standalone unique row now x3 y3 z3 q3 r3", "s"),
    ]
    df = spark.createDataFrame(
        rows, schema="doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text").cast("int")
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    spec = {**QUERIES, **EXTRA_QUERIES}["docs_rater_agreement"]
    r = spec.fn(spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["a1"], r["b1"], r["agree"]) == (5, 3, 4, 4)
    assert r["kappa_milli"] == (5 * 4 - 14) * 1000 // (25 - 14)  # 545


def test_sorted_neighborhood_window_and_blocks(spark):
    """SNM candidates: only docs within `window` positions of the
    in-block sort order pair up; blocks never mix; ids are emitted
    least-first regardless of sort order."""
    from decaton_spark.functions import dedup as dd

    rows = [
        (10, "aa first doc"),
        (11, "ab second doc"),
        (12, "ac third doc"),
        (13, "ad fourth doc"),
        (14, "za other block"),   # block 'z': must never pair with 'a*'
        (15, "zb other block2"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = dd.sorted_neighborhood_pairs(df, window=2)  # adjacent only
    pairs = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert set(pairs) == {(10, 11), (11, 12), (12, 13), (14, 15)}
    assert all(r["rank_gap"] == 1 for r in pairs.values())
    assert pairs[(10, 11)]["block"] == "a"
    assert pairs[(14, 15)]["block"] == "z"

    # window=3 adds the gap-2 neighbours, still in-block only
    out3 = dd.sorted_neighborhood_pairs(df, window=3)
    got3 = {(r["id_a"], r["id_b"]) for r in out3.collect()}
    assert got3 == {
        (10, 11), (11, 12), (12, 13), (14, 15),
        (10, 12), (11, 13),
    }


def test_zipf_fit_recovers_planted_power_law(spark):
    """A corpus whose term frequencies are an exact power law
    freq(r) = 1000·r^(-0.8) must regress to slope ≈ -0.8 with
    near-perfect R²; natural-ish tie-breaking keeps ranks stable."""
    from decaton_spark.functions import text as tx

    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * int(1000 * r ** -0.8)
    df = spark.createDataFrame(
        [(1, " ".join(words))], schema="doc_id long, text string"
    )
    out = tx.zipf_fit(df, top_k=20).collect()[0]
    assert out["n_terms"] == 20
    assert abs(out["slope"] - (-0.8)) < 0.02  # int() floors distort slightly
    assert out["r2_ppm"] > 990_000
    assert abs(out["intercept"] - 6.907755) < 0.05  # ln(1000)


def test_minhash_values_estimate_identical_and_disjoint(spark):
    """Identical documents match on all 8 slots (est 1000 pml);
    shingle-disjoint documents match on none (est 0) up to md5
    coincidence; the slot arrays are deterministic."""
    from decaton_spark.functions import dedup as dd
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),          # identical -> all slots equal
        (3, "p q r s t u v w"),          # disjoint 3-gram shingles
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    mh = {r["id"]: list(r["mh"]) for r in dd.minhash_values(df, k=3).collect()}
    assert len(mh[1]) == 8 and mh[1] == mh[2]
    matches_13 = sum(1 for a, b in zip(mh[1], mh[3]) if a == b)
    assert matches_13 == 0
    # deterministic across evaluations
    again = {r["id"]: list(r["mh"]) for r in dd.minhash_values(df, k=3).collect()}
    assert again == mh


def test_snm_multipass_sorted_key_catches_leading_word_edit(spark):
    """A near-dup whose edit swapped the two LEADING words sorts far
    from its original under the prefix key but adjacent under the
    sorted-token key: pass 2 must recover the pair a single-pass prefix
    SNM misses (the Hernández & Stolfo transposed-key rationale)."""
    from pyspark.sql import functions as F

    from decaton_spark.functions import dedup as dd

    body = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, "alpha zebra " + body),
        (2, "zebra alpha " + body),   # same token set, leading words swapped
        (3, "mmm nnn unrelated words here entirely different"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")

    p1 = dd.sorted_neighborhood_pairs(df, window=2, block_chars=1)
    assert (1, 2) not in {(r["id_a"], r["id_b"]) for r in p1.collect()}

    key2 = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))), " "
    )
    p2 = dd.sorted_neighborhood_pairs(df, window=2, block_chars=1, key_expr=key2)
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in p2.collect()}


def test_wordpiece_greedy_longest_match(spark):
    from decaton_spark.functions import text as tx

    words = spark.createDataFrame(
        [("column",), ("hash",), ("x9z",), ("a",)], "w string"
    )
    out = {r["word"]: (r["pieces"], r["n_pieces"]) for r in
           tx.wordpiece_tokenize_words(words).collect()}
    # greedy longest-first: 'col' beats 'c'; continuations ##-marked
    assert out["column"] == ("col ##um ##n", 3)
    # whole-word piece wins in one step
    assert out["hash"] == ("hash", 1)
    # digit is out-of-vocab: [UNK] stops the word
    assert out["x9z"] == ("x [UNK]", 2)
    assert out["a"] == ("a", 1)


def test_wordpiece_vocab_order_is_greedy(spark):
    from decaton_spark.functions import text as tx

    lens = [len(v) for v in tx.WORDPIECE_VOCAB]
    assert lens == sorted(lens, reverse=True) or all(
        lens[i] > lens[i + 1]
        or (lens[i] == lens[i + 1]
            and tx.WORDPIECE_VOCAB[i] < tx.WORDPIECE_VOCAB[i + 1])
        for i in range(len(lens) - 1)
    )


def test_simhash_banding_pigeonhole_complete(spark):
    """Every pair within Hamming ≤ 3 of the 64-bit two-word simhash
    MUST share one of the 4 sixteen-bit bands — verified against
    brute force on a corpus crafted to differ by 0-5 tokens. (The
    signature is a signed BIGINT; popcount runs on the unsigned
    two's-complement view.)"""
    from itertools import combinations

    from decaton_spark.functions import dedup as dd

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [(0, base)]
    words = base.split()
    for i in range(1, 12):
        toks = list(words)
        for j in range(i % 6):
            toks[(i + j) % len(toks)] = f"mut{i}_{j}"
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_near_dup_pairs(df).collect()
    }
    sigs = {r["doc_id"]: r["simhash"] for r in dd.simhash(df, bits=64).collect()}
    mask = (1 << 64) - 1
    brute = {
        (a, b): bin((sigs[a] ^ sigs[b]) & mask).count("1")
        for a, b in combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & mask).count("1") <= 3
    }
    assert got == brute  # complete AND exact distances


@pytest.mark.parametrize("bits", [16, 64])
def test_simhash_signatures_bit_identical(spark, bits):
    """The codegen vote path (explode + 64-sum aggregation, round 9)
    must reproduce the expression form bit for bit — including the
    NULL-text → NULL signature contract, empty text (split('') yields
    the '' token), single-token docs (every vote unanimous) and
    repeated tokens (array_distinct collapses them identically)."""
    from decaton_spark.functions import dedup as dd

    docs = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta beta beta gamma"),  # dups collapse pre-vote
        (2, ""),                            # '' token, not tokenless
        (3, None),                          # NULL in -> NULL out
        (4, "single"),
        (5, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"),
        (6, "alpha  beta"),                 # double space -> '' token too
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    expr_form = {
        r["doc_id"]: r["simhash"]
        for r in dd.simhash(df, bits=bits).select("doc_id", "simhash").collect()
    }
    agg_form = {
        r["doc_id"]: r["simhash"]
        for r in dd.simhash_signatures(df, bits=bits, num_partitions=4).collect()
    }
    assert agg_form == expr_form
    assert agg_form[3] is None
