"""The driver-shaped gate: every registered query vs its DuckDB oracle.

Runs at sf0.001 (the driver runs the same comparison at sf0.01).
Queries without an oracle get a rows-only sanity check.
"""

from __future__ import annotations

import pytest

from decaton_spark.queries import EXTRA_QUERIES, QUERIES

from tests.utils import assert_frames_match

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = ALL_QUERIES[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only gate for non-SQL-expressible ops must be
        # falsifiable: an empty frame fails (>= 0 was tautological)
        assert len(sdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    odf = duck.sql(spec.oracle).df()
    assert_frames_match(sdf, odf, name)


def test_entry_smoke(spark):
    from decaton_spark.queries import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"key", "survivors", "latest_ms"}


def test_register_rejects_empty_oracle_even_under_O():
    """ADVICE r7: the falsy-oracle guard must be a real raise, not an
    assert — `python -O` strips asserts, silently re-opening the
    rows-only routing hole. Pin that it raises ValueError."""
    import pytest

    from decaton_spark.queries import register

    with pytest.raises(ValueError, match="empty oracle"):
        register("_bogus_empty_oracle", "   ")
