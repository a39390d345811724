"""Distributed BPE tokenizer training over the ``documents`` corpus.

The classic byte-pair-encoding trainer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") in its
map-reduce form: the corpus is scanned ONCE into a (word, count)
histogram, and every merge round afterwards runs against that
histogram — whose size is the corpus *vocabulary*, orders of magnitude
smaller than the corpus itself. At 100 TB the histogram is the only
shuffle over the raw text; each of the R merge rounds is one small
aggregation over the materialized histogram plus a driver round-trip
of exactly one row (the winning pair). This is how production
tokenizer trainers distribute (e.g. the Hadoop/Spark BPE ports of
subword-nmt): pair statistics are associative, so partial aggregation
does the heavy lifting map-side.

Symbol-sequence representation: each word's current segmentation is a
sentinel-delimited string, ``"cat" -> "|c||a||t||_|"`` (every symbol
wrapped in ``|``; ``_`` is the end-of-word marker). Applying a merge
``(a, b) -> ab`` is then a single JVM-side ``replace(state,
'|a||b|', '|ab|')`` — string ``replace`` consumes non-overlapping
occurrences left-to-right, which is exactly BPE's greedy leftmost
application order, and the double sentinel makes cross-symbol-boundary
matches impossible (a pattern ``|b||b|`` can never match inside
``|ab||b|``). Words are restricted to ``[a-z]+`` runs of the lowered
text, so ``|`` and ``_`` can never collide with corpus characters.

Ties on pair count break lexicographically (p1, then p2) — both Spark
and DuckDB compare strings bytewise under default collation, so the
trained merge table is bit-identical cross-engine (the oracle replays
the whole training loop as one unrolled SQL statement).

Reference parity: the reference engine has no tokenizer trainer — this
is part of the beyond-reference LLM-data-pipeline layer (assignment
brief), alongside dedup/quality/DSIR/packing in this package.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"
EOW = "_"


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> (word, cnt) histogram. The ONLY job that
    touches raw text; everything downstream runs on the vocabulary."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def initial_state(word: Column) -> Column:
    """``"cat" -> "|c||a||t||_|"`` — every char a symbol, EOW appended."""
    return F.concat(F.lit("|"), F.regexp_replace(word, "(.)", r"$1||"), F.lit(EOW + "|"))


def state_symbols(state: Column) -> Column:
    """Sentinel string back to its symbol array."""
    return F.split(state.substr(F.lit(2), F.length(state) - 2), r"\|\|")


def _replace(state: Column, p1: str, p2: str) -> Column:
    return F.replace(state, F.lit(f"|{p1}||{p2}|"), F.lit(f"|{p1}{p2}|"))


def merged_state(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Initial segmentation with all ``merges`` applied in rank order."""
    state = initial_state(word)
    for p1, p2 in merges:
        state = _replace(state, p1, p2)
    return state


#: corpora whose scan is under this many compressed bytes train their
#: merge table driver-side: the vocabulary of such a corpus is at most
#: a few million short words — a bounded driver structure in the same
#: class as bradley_terry's duel matrix — and the R sequential merge
#: rounds then cost ONE distributed job (the histogram collect) instead
#: of R aggregation+collect round trips whose per-job floor, not the
#: vocabulary compute, dominates the wall (round-10 profile: 10 rounds
#: x ~0.2 s floor). Bigger corpora keep the distributed loop below.
DRIVER_TRAIN_MAX_BYTES = 1 << 30


def _train_on_histogram(
    rows: list, num_merges: int
) -> list[tuple[str, str, int]]:
    """Exact driver-side replica of the distributed merge loop over a
    collected (word, cnt) histogram: same pair statistics (sum of word
    counts), same winner order (count desc, then p1, p2 bytewise —
    words are [a-z_] ASCII so Python and UTF-8 compare identically),
    same greedy leftmost non-overlapping merge application. Pinned
    equal to the distributed path by test_bpe_driver_path_matches."""
    vocab: list[tuple[list[str], int]] = [
        (list(word) + [EOW], int(cnt)) for word, cnt in rows
    ]
    out: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + cnt
        if not counts:
            break
        (p1, p2), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((p1, p2, c))
        merged = p1 + p2
        for syms, _ in vocab:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == p1 and syms[i + 1] == p2:
                    syms[i : i + 2] = [merged]
                i += 1
    return out


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    driver_max_bytes: int | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, count)]
    in learned order.

    Small corpora (scan under ``driver_max_bytes``, default
    ``DRIVER_TRAIN_MAX_BYTES``) collect the word histogram once and
    run the merge rounds driver-side — exact same statistics and
    tie-breaks, one job instead of R (see ``_train_on_histogram``).
    At scale the histogram is materialized once (``localCheckpoint``
    cuts the lineage so round r does not replay the corpus scan r
    times); each round recomputes segmentations from the checkpointed
    histogram by replaying the r learned replaces — O(R^2) cheap
    string ops over the small vocabulary table in exchange for zero
    mutable distributed state and a plan whose size stays O(R)."""
    from decaton_spark.sources import scan_bytes

    limit = DRIVER_TRAIN_MAX_BYTES if driver_max_bytes is None else driver_max_bytes
    hist = word_histogram(df, text_col)
    nbytes = scan_bytes(df.sparkSession, df)
    if nbytes is not None and nbytes < limit:
        return _train_on_histogram(
            [(r["word"], r["cnt"]) for r in hist.collect()], num_merges
        )
    words = hist.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    out: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        state = merged_state(F.col("word"), merges)
        toks = state_symbols(state)
        pairs = F.zip_with(
            toks,
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("p1"), b.alias("p2")),
        )
        win = (
            words.select(F.explode(pairs).alias("pr"), "cnt")
            .where(F.col("pr.p2").isNotNull())
            .groupBy("pr.p1", "pr.p2")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "p1", "p2")
            .limit(1)
            .collect()
        )
        if not win:  # every word fully merged into one symbol
            break
        p1, p2, c = win[0]["p1"], win[0]["p2"], int(win[0]["c"])
        merges.append((p1, p2))
        out.append((p1, p2, c))
    return out


def symbols_per_word(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Symbol count of a word after applying ``merges``: number of
    ``||`` separators + 1, counted by length delta (exact integer)."""
    state = merged_state(word, merges)
    return (
        (F.length(state) - F.length(F.replace(state, F.lit("||"), F.lit("")))) / 2 + 1
    ).cast("long")


def bpe_oracle_sql(num_merges: int, final_select: str) -> str:
    """Unrolled DuckDB replay of the full training loop: s0..sN hold
    the per-word segmentation after each merge, w0..wN-1 each pick the
    argmax pair (count desc, then lexicographic). ``final_select`` is
    appended and may reference any CTE (words, s{i}, w{i})."""
    parts = [
        f"""
words AS MATERIALIZED (
    SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS w
          FROM documents)
    GROUP BY w),
s0 AS MATERIALIZED (
    SELECT word,
           '|' || regexp_replace(word, '(.)', '\\1||', 'g') || '{EOW}|' AS state,
           cnt
    FROM words)"""
    ]
    for i in range(num_merges):
        parts.append(
            f"""
w{i} AS MATERIALIZED (
    SELECT pr[1] AS p1, pr[2] AS p2, CAST(sum(cnt) AS BIGINT) AS c
    FROM (SELECT unnest(list_zip(toks, toks[2:])) AS pr, cnt
          FROM (SELECT string_split(substr(state, 2, length(state) - 2), '||') AS toks,
                       cnt
                FROM s{i}))
    WHERE pr[2] IS NOT NULL
    GROUP BY p1, p2
    ORDER BY c DESC, p1, p2 LIMIT 1),
s{i + 1} AS MATERIALIZED (
    -- identity when w{i} is empty (merges exhausted): the trainer
    -- stops learning, it does not NULL the segmentations
    SELECT word,
           coalesce(
               replace(state,
                       '|' || (SELECT p1 FROM w{i}) || '||' || (SELECT p2 FROM w{i}) || '|',
                       '|' || (SELECT p1 FROM w{i}) || (SELECT p2 FROM w{i}) || '|'),
               state) AS state,
           cnt
    FROM s{i})"""
        )
    return "WITH " + ",".join(parts) + "\n" + final_select
