"""Unit tests for operators/merge.corpus_merge — the MERGE-semantics
edge cases the fixture query can't reach (nulls, retired content,
empty sides)."""

from __future__ import annotations

from decaton_spark.operators.merge import corpus_merge


def _mk(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def _result(df):
    return {(r["doc_id"], r["origin"], r["text"]) for r in df.collect()}


def test_update_insert_kept_and_content_guard(spark):
    existing = _mk(spark, [(1, "alpha"), (2, "beta"), (3, "gamma")])
    incoming = _mk(
        spark,
        [
            (2, "beta v2"),   # update (changed content)
            (10, "delta"),    # insert, fresh content
            (11, "alpha"),    # insert blocked: content lives at doc 1
        ],
    )
    out = _result(corpus_merge(existing, incoming))
    assert out == {
        (1, "kept", "alpha"),
        (3, "kept", "gamma"),
        (2, "update", "beta v2"),
        (10, "insert", "delta"),
    }


def test_insert_may_take_content_an_update_retired(spark):
    """The content guard checks the POST-update corpus: when an update
    replaces doc 1's text, a new doc may legally bring the old text."""
    existing = _mk(spark, [(1, "old news")])
    incoming = _mk(spark, [(1, "fresh take"), (5, "old news")])
    out = _result(corpus_merge(existing, incoming))
    assert out == {(1, "update", "fresh take"), (5, "insert", "old news")}


def test_update_to_identical_content_still_applies(spark):
    existing = _mk(spark, [(1, "same")])
    incoming = _mk(spark, [(1, "same")])
    assert _result(corpus_merge(existing, incoming)) == {(1, "update", "same")}


def test_within_batch_collapse_lowest_key_wins(spark):
    existing = _mk(spark, [(1, "a")])
    incoming = _mk(spark, [(30, "dup"), (20, "dup"), (40, "dup")])
    out = _result(corpus_merge(existing, incoming))
    assert out == {(1, "kept", "a"), (20, "insert", "dup")}


def test_null_text_rows_never_content_dedup(spark):
    """NULL documents: upserted by key, but exempt from both the
    within-batch collapse and the corpus content guard."""
    existing = _mk(spark, [(1, None), (2, "real")])
    incoming = _mk(spark, [(10, None), (11, None), (1, None)])
    out = _result(corpus_merge(existing, incoming))
    assert out == {
        (2, "kept", "real"),
        (1, "update", None),
        (10, "insert", None),
        (11, "insert", None),
    }


def test_empty_incoming_keeps_everything(spark):
    existing = _mk(spark, [(1, "a"), (2, "b")])
    incoming = _mk(spark, [])
    assert _result(corpus_merge(existing, incoming)) == {
        (1, "kept", "a"),
        (2, "kept", "b"),
    }


def test_empty_existing_inserts_deduped_batch(spark):
    existing = _mk(spark, [])
    incoming = _mk(spark, [(7, "x"), (8, "x"), (9, "y")])
    assert _result(corpus_merge(existing, incoming)) == {
        (7, "insert", "x"),
        (9, "insert", "y"),
    }


# ---------------------------------------------------------------------------
# corpus_merge_neardup — the LSH insert guard
# ---------------------------------------------------------------------------

from decaton_spark.operators.merge import corpus_merge_neardup

_BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def _origins(df):
    return {(r["doc_id"], r["origin"]) for r in df.collect()}


def test_neardup_insert_rejected_against_corpus(spark):
    existing = _mk(spark, [(1, _BASE), (2, "completely different words entirely")])
    incoming = _mk(spark, [(10, _BASE + " kilo")])  # J = 10/11 ≈ 0.909
    out = _origins(corpus_merge_neardup(existing, incoming))
    assert out == {(1, "kept"), (2, "kept")}


def test_below_threshold_insert_survives(spark):
    existing = _mk(spark, [(1, _BASE)])
    # shares 3 of 10+ tokens — far below 0.8
    incoming = _mk(spark, [(10, "alpha bravo charlie x y z w v u t")])
    out = _origins(corpus_merge_neardup(existing, incoming))
    assert out == {(1, "kept"), (10, "insert")}


def test_neardup_insert_vs_insert_lowest_key_wins(spark):
    existing = _mk(spark, [(1, "unrelated corpus document text here")])
    incoming = _mk(
        spark,
        [(30, _BASE + " kilo"), (20, _BASE + " lima")],  # J = 9/11 ≈ 0.818
    )
    out = _origins(corpus_merge_neardup(existing, incoming))
    assert out == {(1, "kept"), (20, "insert")}


def test_exact_guard_runs_before_lsh(spark):
    """Byte-identical content is dropped by md5 even when whitespace
    tricks could change the token multiset seen by LSH."""
    existing = _mk(spark, [(1, _BASE)])
    incoming = _mk(spark, [(10, _BASE)])
    out = _origins(corpus_merge_neardup(existing, incoming))
    assert out == {(1, "kept")}


def test_null_text_exempt_from_neardup_guard(spark):
    existing = _mk(spark, [(1, None), (2, _BASE)])
    incoming = _mk(spark, [(10, None)])
    out = _origins(corpus_merge_neardup(existing, incoming))
    assert out == {(1, "kept"), (2, "kept"), (10, "insert")}


def test_neardup_update_always_applies(spark):
    """Updates are never guarded — re-crawling a known doc with
    near-identical content must still apply."""
    existing = _mk(spark, [(1, _BASE), (2, "other content entirely here")])
    incoming = _mk(spark, [(1, _BASE + " kilo")])
    out = _origins(corpus_merge_neardup(existing, incoming))
    assert out == {(1, "update"), (2, "kept")}


def test_snapshot_diff_classifies_all_four_ways(spark):
    from decaton_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "was this"), (3, "gone")],
        schema="doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now this"), (4, "fresh")],
        schema="doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert out[1]["change"] == "unchanged"
    assert out[2]["change"] == "changed"
    assert out[3]["change"] == "removed" and out[3]["new_hash"] is None
    assert out[4]["change"] == "added" and out[4]["old_hash"] is None
    assert set(out) == {1, 2, 3, 4}


def _scd2(spark, dim_rows, batch_rows, ts=1000):
    from decaton_spark.operators.merge import scd2_merge

    dim = spark.createDataFrame(
        dim_rows, "k long, attr string, valid_from_ms long, valid_to_ms long"
    )
    batch = spark.createDataFrame(batch_rows, "k long, attr string")
    return scd2_merge(
        dim, batch, key="k", compare_cols=["attr"], batch_ts_ms=ts
    ).collect()


def test_scd2_changed_key_closes_and_opens(spark):
    out = _scd2(spark, [(1, "a", 0, None)], [(1, "b")])
    rows = {(r.k, r.attr, r.valid_from_ms, r.valid_to_ms) for r in out}
    assert rows == {(1, "a", 0, 1000), (1, "b", 1000, None)}


def test_scd2_identical_resend_mints_nothing(spark):
    out = _scd2(spark, [(1, "a", 0, None)], [(1, "a")])
    assert [(r.k, r.attr, r.valid_from_ms, r.valid_to_ms) for r in out] == [
        (1, "a", 0, None)
    ]


def test_scd2_null_attr_compares_null_safe(spark):
    # NULL == NULL is a match (no version); NULL -> value is a change
    out = _scd2(spark, [(1, None, 0, None), (2, None, 0, None)], [(1, None), (2, "v")])
    rows = {(r.k, r.attr, r.valid_from_ms, r.valid_to_ms) for r in out}
    assert rows == {
        (1, None, 0, None),
        (2, None, 0, 1000),
        (2, "v", 1000, None),
    }


def test_scd2_absent_keys_and_history_pass_through(spark):
    out = _scd2(
        spark,
        [(1, "old", 0, 500), (1, "cur", 500, None), (2, "other", 0, None)],
        [(1, "new")],
    )
    rows = {(r.k, r.attr, r.valid_from_ms, r.valid_to_ms) for r in out}
    assert rows == {
        (1, "old", 0, 500),        # closed history untouched
        (1, "cur", 500, 1000),     # current row closes at batch ts
        (1, "new", 1000, None),    # new version opens
        (2, "other", 0, None),     # key absent from batch: untouched
    }
