"""F1/F2/F3 — key blocklist filter, invalid-task discard, projection.

Reference:
- F1 ``BlacklistedKeysFilter.shouldTake()``
  (``processor/.../runtime/internal/BlacklistedKeysFilter.java:38-57``,
  property ``decaton.ignore.keys``): drop records whose key is in a
  dynamically reloadable blocklist; dropped records still commit.
- F2 ``ProcessPipeline.scheduleThenProcess()``
  (``processor/.../runtime/internal/ProcessPipeline.java:76-91``):
  extraction/validation failure drops the record and counts
  ``tasks.discarded``.
- F3 ``ProcessingContextImpl.metadata()/key()/headers()``: user code
  sees only ``{metadata, key, headers}`` + typed payload.

Blocklists at scale: an ``isin`` literal list compiles into the scan
predicate for small lists; for huge blocklists use ``ignore_keys_df``
(broadcast anti-join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ignore_keys(df: DataFrame, keys: Sequence[str], key_col: str = "key") -> DataFrame:
    """Drop rows whose key is blocklisted; null keys always pass
    (the reference routes null keys round-robin and never blocks them)."""
    if not keys:
        return df
    c = F.col(key_col)
    return df.filter(c.isNull() | ~c.isin(list(keys)))


def ignore_keys_df(df: DataFrame, keys_df: DataFrame, key_col: str = "key") -> DataFrame:
    """Blocklist as a DataFrame (one column named like ``key_col``):
    broadcast left-anti join — the scale path for large blocklists."""
    return df.join(F.broadcast(keys_df), on=key_col, how="left_anti")


def discard_invalid(
    df: DataFrame,
    value_col: str = "value",
    payload_schema: T.StructType | str = "k INT",
    parsed_col: str = "payload",
) -> DataFrame:
    """Parse the opaque value; drop rows that fail extraction.

    JSON parse failure yields a null struct (Spark's PERMISSIVE mode),
    mirroring the reference's catch-and-count discard. The count is
    observable via ``df.observe`` at the call site.
    """
    parsed = F.from_json(F.col(value_col).cast("string"), payload_schema)
    return df.withColumn(parsed_col, parsed).filter(F.col(parsed_col).isNotNull())


def project_task_view(df: DataFrame, extra_cols: Sequence[str] = ()) -> DataFrame:
    """F3: the narrow view user processors receive."""
    meta_cols = [c for c in df.columns if c.startswith("meta_")]
    keep = ["key", *meta_cols, *extra_cols]
    return df.select(*[c for c in keep if c in df.columns])
