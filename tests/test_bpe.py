"""Distributed BPE trainer (functions/bpe.py) vs a pure-Python
reference implementation, plus representation-safety edge cases and
the no-corpus-rescan plan property."""

from __future__ import annotations

import collections
import re

import pytest
from pyspark.sql import functions as F

from decaton_spark.functions import bpe


def ref_bpe(texts: list[str], n: int) -> list[tuple[str, str, int]]:
    """Textbook BPE (Sennrich et al. 2016): word histogram, then n
    rounds of count-all-adjacent-pairs -> merge the argmax (ties by
    lexicographic pair order), leftmost-greedy application."""
    words = collections.Counter(
        w for t in texts for w in re.findall(bpe.WORD_RE, t.lower())
    )
    segs = {w: list(w) + [bpe.EOW] for w in words}
    out: list[tuple[str, str, int]] = []
    for _ in range(n):
        pc: collections.Counter = collections.Counter()
        for w, c in words.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (p1, p2), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((p1, p2, c))
        for w in segs:
            s = segs[w]
            ns: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == p1 and s[i + 1] == p2:
                    ns.append(p1 + p2)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            segs[w] = ns
    return out


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


def test_bpe_matches_reference_impl(spark):
    texts = ["the cat sat on the mat", "the bat and the cat", "that hat"]
    assert bpe.bpe_train(_df(spark, texts), num_merges=6) == ref_bpe(texts, 6)


def test_bpe_sentinel_boundary_safety(spark):
    """A merged symbol that is a suffix/prefix of another must never
    produce a phantom cross-boundary match: in 'abb' after merge
    (a,b), the state is |ab||b||_| and pattern |b||b| must NOT match
    inside it. The reference implementation is immune by construction,
    so agreement proves the string encoding is too."""
    texts = ["abb abb bb bb bb ab ab ab"]
    assert bpe.bpe_train(_df(spark, texts), num_merges=4) == ref_bpe(texts, 4)


def test_bpe_overlapping_run_leftmost_greedy(spark):
    """'aaaa' with merge (a,a): leftmost non-overlapping gives
    [aa, aa]; the (aa,aa) pair must then be countable."""
    texts = ["aaaa aaaa aaaa"]
    assert bpe.bpe_train(_df(spark, texts), num_merges=3) == ref_bpe(texts, 3)


def test_bpe_single_letter_words_and_exhaustion(spark):
    """Single-letter words still carry the EOW pair; training stops
    early (returns fewer merges) once every word is one symbol."""
    texts = ["a a a b"]
    got = bpe.bpe_train(_df(spark, texts), num_merges=10)
    assert got == ref_bpe(texts, 10)
    assert len(got) < 10  # exhausted: 'a_' and 'b_' fully merged


def test_symbols_per_word_counts(spark):
    texts = ["the the the thx"]
    trained = bpe.bpe_train(_df(spark, texts), num_merges=2)
    merges = [(a, b) for a, b, _ in trained]
    rows = (
        _df(spark, ["the thx q"])
        .select(
            F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .select("word", bpe.symbols_per_word(F.col("word"), merges).alias("n"))
        .collect()
    )
    by_word = {r["word"]: r["n"] for r in rows}
    # replay with the reference: count symbols after applying merges
    def apply(word):
        s = list(word) + [bpe.EOW]
        for p1, p2 in merges:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == p1 and s[i + 1] == p2:
                    ns.append(p1 + p2)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        return len(s)

    for w in ["the", "thx", "q"]:
        assert by_word[w] == apply(w), w


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:
    # Property triangle: the registry proves Spark == DuckDB-oracle on
    # the fixtures; this proves DuckDB-oracle == reference-impl on
    # arbitrary corpora (word shapes chosen to stress merge collisions:
    # tiny alphabet => heavy pair reuse, runs, prefixes/suffixes).
    _corpus = st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=24),
        min_size=0,
        max_size=6,
    )

    @settings(max_examples=60, deadline=None)
    @given(texts=_corpus, n=st.integers(min_value=1, max_value=5))
    def test_oracle_replay_matches_reference_impl(texts, n):
        import duckdb
        import pandas as pd

        # dtype=str keeps an empty corpus typed VARCHAR, not DOUBLE
        docs = pd.DataFrame({"text": pd.Series(texts, dtype=str)})
        con = duckdb.connect()
        con.register("documents", docs)
        sel = (
            "SELECT * FROM ("
            + " UNION ALL ".join(
                f"SELECT {i} AS r, p1, p2, c FROM w{i}" for i in range(n)
            )
            + ") ORDER BY r"
        )
        got = [
            (p1, p2, int(c))
            for _, p1, p2, c in con.sql(bpe.bpe_oracle_sql(n, sel)).fetchall()
        ]
        assert got == ref_bpe(texts, n)


def test_bpe_driver_path_matches_distributed(spark, sf_dir):
    """The size-adaptive driver-side trainer (round 10) must learn the
    exact same merge table — same pairs, same counts, same order — as
    the distributed loop it replaces on small corpora. Run both paths
    on the parquet fixture by forcing the byte threshold each way."""
    from decaton_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    driver = bpe.bpe_train(docs, num_merges=6, driver_max_bytes=1 << 40)
    distributed = bpe.bpe_train(docs, num_merges=6, driver_max_bytes=0)
    assert driver == distributed


def test_bpe_round_plan_never_rescans_corpus(spark, sf_dir):
    """The scale contract: after the histogram localCheckpoint, a
    merge round's pair-count job must read the checkpointed RDD, not
    the parquet corpus (merge rounds over 100 TB would otherwise
    re-scan the corpus R times)."""
    from decaton_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    words = bpe.word_histogram(docs).localCheckpoint(eager=True)
    state = bpe.merged_state(F.col("word"), [("t", "h")])
    toks = bpe.state_symbols(state)
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("p1"), b.alias("p2")),
    )
    round_df = (
        words.select(F.explode(pairs).alias("pr"), "cnt")
        .where(F.col("pr.p2").isNotNull())
        .groupBy("pr.p1", "pr.p2")
        .agg(F.sum("cnt").alias("c"))
    )
    plan = round_df._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower(), plan
    assert "HashAggregate" in plan  # partial-agg pair counting


def test_oracle_states_identity_after_exhaustion():
    """Once merges exhaust, later oracle rounds must leave the
    segmentations untouched (identity, not NULL) — matching the
    trainer, which stops learning. Replays 10 rounds on a corpus that
    exhausts after ~4 merges and checks the FINAL states."""
    import duckdb
    import pandas as pd

    texts = ["a a b ab"]
    docs = pd.DataFrame({"text": pd.Series(texts, dtype=str)})
    con = duckdb.connect()
    con.register("documents", docs)
    sql = bpe.bpe_oracle_sql(10, "SELECT word, state FROM s10 ORDER BY word")
    got = dict(con.sql(sql).fetchall())
    assert all(s is not None for s in got.values()), got

    # reference: apply the full learned merge list to each word
    merges = [(p1, p2) for p1, p2, _ in ref_bpe(texts, 10)]
    assert len(merges) < 10  # the corpus really does exhaust

    def seg(word):
        s = list(word) + [bpe.EOW]
        for p1, p2 in merges:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == p1 and s[i + 1] == p2:
                    ns.append(p1 + p2)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        return "|" + "||".join(s) + "|"

    for w in ["a", "b", "ab"]:
        assert got[w] == seg(w), (w, got[w], seg(w))
