"""Incremental corpus merge — upsert a document batch into an existing
corpus with content-level dedup against the live index.

The day-2 problem of a training-data pipeline: the corpus already
exists (100 TB of curated documents) and a new crawl/batch arrives.
Three things must happen in one pass:

- **update**: a batch row whose key already exists replaces the stored
  row (document re-crawled, metadata corrected) — regardless of
  whether the content changed;
- **insert**: a batch row with a new key joins the corpus only if its
  content is not already there (the crawl re-discovered a known page
  under a new URL/id) — checked against the *post-update* corpus, so
  an insert may legally carry the text an update just retired;
- **within-batch dedup**: two new rows with identical content collapse
  to one (lowest key wins, deterministically).

Merge semantics mirror ANSI/Delta ``MERGE INTO`` (WHEN MATCHED THEN
UPDATE / WHEN NOT MATCHED THEN INSERT) plus the content-hash insert
guard no SQL MERGE expresses.

100 TB shape — the corpus NEVER shuffles. Every join puts the
batch-derived (small) side in a broadcast:

- ``kept``      = existing  ⟕anti  broadcast(batch keys)          — the one full
  corpus scan the output requires anyway;
- ``matched``   = existing.keys  ⟕semi  broadcast(batch keys)     — key-column-only
  scan (column pruning keeps it narrow);
- content guard = corpus md5s  ⟕semi  broadcast(insert md5s)      — map-only scan
  producing at most |batch| rows, then inverted into a broadcast
  anti-join against the inserts.

So the corpus is read (not shuffled) 2–3 times; the batch-sized sides
(keys, candidate hashes, the window that dedups inserts) are all
bounded by |batch|, not |corpus|. On a real deployment you would
persist the corpus fingerprint column as its own index table (see
``streaming/stateful.py:streaming_lsh_candidates`` for the streaming
form) and probe that
instead of re-hashing text — the join topology here is unchanged by
that swap.

NULL text never content-matches anything (SQL NULL semantics): null
documents are upserted by key like any row but are exempt from both
within-batch collapse and the corpus content guard — each keeps its
own key (the dedup key falls back to ``'null:' || key``).

Reference parity: the reference engine (line/decaton) is a task
processor with no corpus/merge surface — this is part of the
beyond-reference LLM-pipeline layer (SURVEY.md §7.1), kin to its
last-wins compaction (``processor/.../CompactionProcessor.java``)
generalized from per-key last-wins to keyed upsert + content identity.

Precondition: ``incoming`` must be key-unique (one row per key in the
batch — the usual contract of a MERGE source; ``compact_tasks`` is the
engine's operator for establishing it when the batch is a raw log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _merge_parts(
    existing: DataFrame,
    incoming: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three merge streams before tagging: (kept, updates,
    inserts) — inserts already collapsed within-batch and guarded
    against the post-update corpus content set. Shared by
    ``corpus_merge`` (which unions them) and ``corpus_merge_neardup``
    (which adds an LSH near-dup guard on the inserts first)."""
    inc_keys = incoming.select(key)
    # keys of `incoming` that already exist: scan ONLY the corpus key
    # column; result is bounded by |incoming|, so it re-broadcasts below
    matched = existing.select(key).join(F.broadcast(inc_keys), key, "left_semi")
    kept = existing.join(F.broadcast(inc_keys), key, "left_anti")
    updates = incoming.join(F.broadcast(matched), key, "left_semi")
    ins_raw = incoming.join(F.broadcast(matched), key, "left_anti")

    # within-batch content collapse: lowest key per content hash wins;
    # NULL text gets a per-key sentinel so nulls never collapse together
    dk = F.coalesce(
        F.md5(F.col(text_col)),
        F.concat(F.lit("null:"), F.col(key).cast("string")),
    )
    w = Window.partitionBy("dk").orderBy(key)
    ins_dedup = (
        ins_raw.withColumn("dk", dk)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # content guard: which candidate hashes already live in the
    # post-update corpus? Probe the corpus WITH the candidates
    # broadcast (never the reverse — the corpus side only streams),
    # then anti-join the (≤|batch|-row) hit list back into the inserts.
    cand_hashes = ins_dedup.select(F.col("dk").alias("m"))
    corpus_hits = (
        kept.select(F.md5(F.col(text_col)).alias("m"))
        .unionByName(updates.select(F.md5(F.col(text_col)).alias("m")))
        .where(F.col("m").isNotNull())
        .join(F.broadcast(cand_hashes), "m", "left_semi")
        .distinct()
    )
    inserts = ins_dedup.join(
        F.broadcast(corpus_hits), ins_dedup["dk"] == corpus_hits["m"], "left_anti"
    ).drop("dk")
    return kept, updates, inserts


def _tag_union(kept: DataFrame, updates: DataFrame, inserts: DataFrame) -> DataFrame:
    tag = lambda df, o: df.withColumn("origin", F.lit(o))  # noqa: E731
    return (
        tag(kept, "kept")
        .unionByName(tag(updates, "update"))
        .unionByName(tag(inserts, "insert"))
    )


def corpus_merge(
    existing: DataFrame,
    incoming: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Merge ``incoming`` (key-unique batch) into ``existing``.

    Returns the merged corpus with the same columns plus ``origin`` ∈
    {'kept', 'update', 'insert'} — the per-row merge lineage (drop it
    before writing if not wanted; keeping it costs nothing and lets
    callers audit exactly what a batch did).
    """
    return _tag_union(*_merge_parts(existing, incoming, key, text_col))


def corpus_merge_neardup(
    existing: DataFrame,
    incoming: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """``corpus_merge`` with a NEAR-duplicate insert guard: an insert
    is also rejected when it is a verified near-dup (exact unigram
    Jaccard ≥ ``threshold`` on an LSH-banded candidate set) of a
    post-update corpus document, or of a lower-keyed insert in the
    same batch (greedy lowest-key-wins, the standard LSH-dedup rule —
    no transitive closure: a chain a~b~c with a<b<c keeps only a,
    exactly like a batch pass of the full near-dup pipeline's
    candidate stage without components).

    Guard order: the exact content guard runs first (md5 — catches
    byte-identity including whitespace LSH can miss), the near-dup
    guard second on its survivors (catches token-set similarity md5
    can't see).

    100 TB shape: the candidate join puts the batch signatures in a
    broadcast against the corpus signature stream — (band, sig)
    equi-join, Σ bucket² bounded, corpus never shuffles. Computing
    corpus signatures here costs one shingle+md5 scan of the corpus;
    a real deployment persists the band-signature table as the dedup
    index (``streaming/stateful.py:streaming_lsh_candidates`` is its
    streaming maintainer) and probes it instead — same join topology.
    Jaccard verification touches only candidate ids (two equi-joins
    of the pair list against the gram sets).

    NULL-text rows: a NULL signature never equi-joins, so (matching
    ``corpus_merge``'s md5 guard) null documents are exempt from the
    near-dup guard on both sides.
    """
    from decaton_spark.functions.dedup import (
        minhash_band_signatures,
        verify_pairs_jaccard,
    )

    # unlike plain corpus_merge (each part consumed once), the guard
    # reads every part 2-4x (banding, gram sets, final union) — without
    # materialization each broadcast job re-runs the whole merge-join
    # chain (measured ~2x wall at sf0.1). ONE checkpoint of the tagged
    # union (not three per-part ones — one materialization job) serves
    # every downstream read; at cluster scale this is the persisted
    # post-update-merge staging table.
    parts = _tag_union(*_merge_parts(existing, incoming, key, text_col))
    parts = parts.localCheckpoint(eager=False)
    corpus = parts.filter(F.col("origin") != "insert").drop("origin")
    inserts = parts.filter(F.col("origin") == "insert").drop("origin")

    ins_sigs = minhash_band_signatures(
        inserts, text_col=text_col, id_col=key, k=k, bands=bands
    ).localCheckpoint(eager=False)
    corpus_sigs = minhash_band_signatures(
        corpus, text_col=text_col, id_col=key, k=k, bands=bands
    )
    # ONE candidate join covers both guard directions: the probe side
    # is (corpus ∪ inserts) signatures, the broadcast side is the
    # insert signatures; a corpus hit rejects the insert outright, an
    # insert-insert hit rejects only the higher key. Multi-band double
    # hits are NOT distinct'd away — the verify below just re-checks
    # them and the left_anti at the end is duplicate-insensitive, so
    # skipping the dedup shuffles is pure win.
    left = corpus_sigs.select(
        "band", "sig", F.col(key).alias("id_a"), F.lit(True).alias("from_corpus")
    ).unionByName(
        ins_sigs.select(
            "band", "sig", F.col(key).alias("id_a"),
            F.lit(False).alias("from_corpus"),
        )
    )
    right = ins_sigs.select("band", "sig", F.col(key).alias("id_b"))
    pairs = (
        left.join(F.broadcast(right), ["band", "sig"])
        .filter(F.col("from_corpus") | (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
    )

    all_docs = corpus.unionByName(inserts)
    verified = verify_pairs_jaccard(
        all_docs, pairs, text_col=text_col, id_col=key, n=1, threshold=threshold
    )
    rejected = verified.select(F.col("id_b").alias(key))
    survivors = inserts.join(F.broadcast(rejected), key, "left_anti")
    return parts.filter(F.col("origin") != "insert").unionByName(
        survivors.withColumn("origin", F.lit("insert"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff — the audit companion to ``corpus_merge``:
    classify every id across two corpus versions as ``added`` (new
    only), ``removed`` (old only), ``changed`` (both, content hash
    differs) or ``unchanged``. Release pipelines publish this table
    with every corpus version bump (what moved between v3.1 and v3.2,
    and how much retraining data it invalidates).

    Content compare is md5-of-text computed per side as a projection
    BEFORE the join, so the (wide) payload never rides the shuffle —
    each side ships (id, 32-byte hash) into one full-outer equi-join
    on the id. On bucketed/Iceberg tables co-partitioned by id the
    exchange disappears entirely.

    NULL text is a legal content state, distinct from empty text: the
    hash input is a presence flag ('1'/'0') concatenated with the
    coalesced text, so md5 never goes NULL (md5(NULL) is NULL, which
    would misclassify a both-sides-present row as 'added') and
    NULL vs '' compare as 'changed', NULL vs NULL as 'unchanged'.

    Returns (doc_id, change, old_hash, new_hash).
    """

    def _content_hash(col: str):
        flagged = F.concat(
            F.when(F.col(col).isNull(), F.lit("0")).otherwise(F.lit("1")),
            F.coalesce(F.col(col), F.lit("")),
        )
        return F.md5(flagged.cast("binary"))

    o = old.select(
        F.col(id_col).alias("doc_id"),
        _content_hash(text_col).alias("old_hash"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        _content_hash(text_col).alias("new_hash"),
    )
    j = o.join(n, "doc_id", "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("doc_id", change.alias("change"), "old_hash", "new_hash")


def scd2_merge(
    dim: DataFrame,
    batch: DataFrame,
    *,
    key: str,
    compare_cols: list[str],
    batch_ts_ms: int,
    valid_from: str = "valid_from_ms",
    valid_to: str = "valid_to_ms",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: close-and-insert.

    ``dim`` is the versioned dimension (attribute columns + validity
    interval ``[valid_from, valid_to)``; ``valid_to`` NULL = current
    row). ``batch`` carries one candidate row per key with the attribute
    columns. Per batch key:

    - attributes identical to the current row (null-safe compare over
      ``compare_cols``) → no-op, the current row stands (re-sending an
      unchanged record must NOT mint a version — change detection, not
      blind upsert);
    - attributes differ → the current row closes (``valid_to`` :=
      ``batch_ts_ms``) and a new current row opens (``valid_from`` :=
      ``batch_ts_ms``, ``valid_to`` NULL);
    - keys absent from the batch, and all historical (already-closed)
      rows, pass through untouched.

    Precondition: ``batch`` is key-unique (same contract as
    ``corpus_merge``) and every batch key exists in the dimension
    (pair with ``corpus_merge`` / an insert pass for brand-new keys).

    100 TB shape — like ``corpus_merge``, the dimension NEVER
    shuffles: the batch is broadcast into one left join against the
    current rows, and the three output legs (untouched / closed / new)
    are projections of that single joined frame, unioned with the
    historical passthrough. On a date-partitioned dimension the
    ``valid_to IS NULL`` current-row predicate prunes to the live
    partition before the join.

    Reference parity: beyond-reference warehouse-maintenance layer
    (SURVEY.md §7.1), the keyed-upsert kin of the reference's
    last-wins compaction (processor/.../CompactionProcessor.java)
    with version history retained instead of discarded.
    """
    cur = dim.filter(F.col(valid_to).isNull())
    hist = dim.filter(F.col(valid_to).isNotNull())
    bk = f"__b_{key}"
    b = F.broadcast(
        batch.select(
            F.col(key).alias(bk), *[F.col(c).alias(f"__b_{c}") for c in compare_cols]
        )
    )
    j = cur.join(b, F.col(key) == F.col(bk), "left")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__b_{c}"))
    matched = F.col(bk).isNotNull()
    dim_cols = dim.columns
    untouched = j.filter(~matched | same).select(*dim_cols)
    changed = j.filter(matched & ~same)
    closed = changed.select(
        *[
            F.lit(batch_ts_ms).cast("long").alias(c) if c == valid_to else F.col(c)
            for c in dim_cols
        ]
    )
    opened = changed.select(
        *[
            F.col(f"__b_{c}").alias(c)
            if c in compare_cols
            else F.lit(batch_ts_ms).cast("long").alias(c)
            if c == valid_from
            else F.lit(None).cast("long").alias(c)
            if c == valid_to
            else F.col(c)
            for c in dim_cols
        ]
    )
    return (
        untouched.unionByName(closed).unionByName(opened).unionByName(hist)
    )
