"""Unit tests for operators/expectations — NULL strictness, multi-rule
violations, and the pass/quarantine/stats contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from decaton_spark.operators.expectations import apply_expectations


def _mk(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "click"),
            (2, -5.0, "click"),      # value rule
            (3, None, "view"),       # NULL predicate -> violation
            (4, 3.0, "bogus"),       # type rule
            (5, -1.0, "bogus"),      # two rules at once
        ],
        schema="id long, value double, event_type string",
    )


RULES = lambda: {  # noqa: E731
    "value_non_negative": F.col("value") >= 0,
    "known_type": F.col("event_type").isin("click", "view"),
}


def test_split_and_violation_lists(spark):
    passed, quarantined, stats = apply_expectations(_mk(spark), RULES())
    assert [r["id"] for r in passed.collect()] == [1]
    assert "violations" not in passed.columns
    got = {r["id"]: sorted(r["violations"]) for r in quarantined.collect()}
    assert got == {
        2: ["value_non_negative"],
        3: ["value_non_negative"],  # NULL must not pass
        4: ["known_type"],
        5: ["known_type", "value_non_negative"],
    }


def test_stats_counts(spark):
    _, _, stats = apply_expectations(_mk(spark), RULES())
    got = {r["rule"]: r["n_violations"] for r in stats.collect()}
    assert got == {"value_non_negative": 3, "known_type": 2}


def test_all_clean_passes_everything(spark):
    df = _mk(spark).filter(F.col("id") == 1)
    passed, quarantined, stats = apply_expectations(df, RULES())
    assert passed.count() == 1
    assert quarantined.count() == 0
    # one row per DECLARED rule even when nothing violates it — the
    # monitoring schema must not depend on the data
    got = {r["rule"]: r["n_violations"] for r in stats.collect()}
    assert got == {"value_non_negative": 0, "known_type": 0}


def test_out_col_collision_raises(spark):
    df = _mk(spark).withColumn("violations", F.lit("pre-existing"))
    try:
        apply_expectations(df, RULES())
        assert False, "expected ValueError on out_col collision"
    except ValueError:
        pass
    # custom out_col avoids the collision and is plumbed through
    passed, quarantined, stats = apply_expectations(
        df, RULES(), out_col="dq_violations"
    )
    assert "violations" in passed.columns  # user's column preserved
    assert "dq_violations" in quarantined.columns
    assert stats.count() == 2
