"""Multi-format batch file IO: parquet / ORC / JSON-lines / CSV.

The reference engine ingests exclusively from Kafka
(`processor/src/main/java/com/linecorp/decaton/processor/runtime/ProcessorSubscription.java`);
a data-lake engine additionally needs first-class file formats for
backfills, exports, and interchange. These helpers keep the format
axis orthogonal to every operator in the engine: any registered query
runs unchanged over a table materialized in any of the four formats
(round-trip parity is pinned in tests/test_file_sources.py).

Scale rules encoded here:

- **Schema is always explicit for text formats.** CSV/JSON schema
  inference is a full extra pass over the data (at 100 TB, a second
  100 TB scan) and can mis-type sparse columns; ``read_table`` demands
  a DDL schema for csv/json and disables inference outright.
- **Columnar in, columnar out.** Parquet/ORC readers keep predicate
  pushdown + column pruning (text formats can only prune columns after
  parsing). ``write_table`` defaults to parquet + zstd.
- **Layout is part of the write.** ``partition_by`` produces
  hive-partitioned directories so downstream filters become partition
  pruning (pinned in tests); ``max_records_per_file`` bounds file size
  so a 1000-executor read parallelizes without small-file explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

#: options that make CSV round-trip-safe for free text (embedded
#: newlines, quotes, commas, leading/trailing spaces)
_CSV_COMMON = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def write_table(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    sort_by: tuple[str, ...] = (),
    sort_partitions: int | None = None,
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Materialize ``df`` at ``path`` in ``fmt`` with a scale-sane layout.

    ``sort_by`` produces a globally range-partitioned, within-file
    sorted layout: each output file covers a disjoint key range, so
    parquet/ORC min-max (zone-map) statistics let a point or range
    filter skip whole files/row-groups at scan time — the columnar
    analog of an index. This is a full sort (one range-partitioning
    shuffle) paid once at write time to make every later selective
    read cheap.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if sort_by:
        # explicit partition count pins the file count (AQE otherwise
        # coalesces a small write to one file); at scale size it to
        # target_rows / rows_per_file
        args = ((sort_partitions,) if sort_partitions else ()) + tuple(sort_by)
        df = df.repartitionByRange(*args).sortWithinPartitions(*sort_by)
    w = df.write.mode(mode)
    if compression is None:
        compression = "zstd" if fmt in ("parquet", "orc") else "none"
    w = w.option("compression", compression)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if fmt == "csv":
        for k, v in _CSV_COMMON.items():
            w = w.option(k, v)
        # free text can embed newlines; quote them rather than corrupt rows
        w = w.option("multiLine", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)


def read_table(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a table written by ``write_table``.

    For csv/json a ``schema`` (DDL string or StructType) is REQUIRED:
    inference is an extra full scan and silently mis-types sparse
    columns — fail loudly instead.

    ``corrupt_col`` (text formats only) switches on PERMISSIVE
    ingestion: malformed records land whole in that extra string
    column instead of failing the job or being silently dropped —
    at 100 TB some records WILL be malformed, and the right contract
    is quarantine-and-continue (filter ``corrupt_col IS NOT NULL``
    into a dead-letter table, like the task pipeline's F2 discard).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if corrupt_col is not None and fmt not in ("json", "csv"):
        raise ValueError("corrupt_col applies to text formats only")
    r = spark.read
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(
                f"{fmt} requires an explicit schema (inference = extra full scan)"
            )
        if corrupt_col is not None:
            if isinstance(schema, str):
                schema = f"{schema}, {corrupt_col} string"
            else:
                from pyspark.sql.types import StringType, StructField

                schema = StructType(
                    [*schema.fields, StructField(corrupt_col, StringType())]
                )
            r = (
                r.option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", corrupt_col)
            )
        r = r.schema(schema).option("inferSchema", "false")
    elif schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        for k, v in _CSV_COMMON.items():
            r = r.option(k, v)
        r = r.option("multiLine", "true")
    return getattr(r, fmt)(path)


def scale_to_bits(col, lo: float, hi: float, bits: int = 16):
    """Map a numeric column into [0, 2^bits) by min-max scaling —
    the normalization step before Z-order interleaving. ``lo``/``hi``
    come from table statistics (computed once, offline, like any index
    build); out-of-range values clamp."""
    from pyspark.sql import functions as F

    n = (1 << bits) - 1
    scaled = (col.cast("double") - lo) / max(hi - lo, 1e-12) * n
    return F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(n))


def zorder_key(cols, bits: int = 16):
    """Morton (Z-order) interleave of up to a few pre-scaled integer
    columns (see ``scale_to_bits``) — one long key whose sort order
    clusters rows that are close in EVERY dimension.

    Sorting a write by this key (``write_table(sort_by=("zkey",))``)
    gives each output file a small bounding box in all participating
    columns at once, so parquet min-max statistics prune selective
    filters on ANY of them — the lakehouse Z-ORDER BY, as a plain
    codegen-able expression (bits × n_cols shift/or ops, no UDF).
    """
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    n = len(cols)
    if bits * n > 62:
        raise ValueError("bits * len(cols) must fit in a long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    *,
    fmt: str = "parquet",
    target_file_mb: int = 128,
    sort_by: tuple[str, ...] = (),
) -> dict:
    """Table maintenance (the OPTIMIZE/rewrite step): coalesce a
    directory of small files into ~``target_file_mb`` files at
    ``out_path``. Small files are the silent scan killer at 100 TB —
    every file costs a task, an open, and a footer read; streaming
    sinks and fine-grained partitioning both produce them, and this
    is the compaction pass a table format (Delta/Iceberg) schedules.

    Sizing reads only filesystem metadata (no data scan); the rewrite
    is one coalesce (narrow, no shuffle) — or, with ``sort_by``, the
    write_table range-sorted layout (one shuffle that also buys
    zone-map file skipping). Returns {files_before, files_after,
    bytes, target_files}."""
    import math
    import os

    data_files, total = [], 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            p = os.path.join(root, n)
            data_files.append(p)
            total += os.path.getsize(p)
    n_target = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = getattr(spark.read, fmt)(path)
    if sort_by:
        write_table(
            df, out_path, fmt=fmt, sort_by=sort_by, sort_partitions=n_target
        )
    else:
        write_table(df.coalesce(n_target), out_path, fmt=fmt)
    after = sum(
        1
        for _r, _d, names in os.walk(out_path)
        for n in names
        if not n.startswith(("_", "."))
        and not n.endswith((".crc", "_SUCCESS"))
    )
    return {
        "files_before": len(data_files),
        "files_after": after,
        "bytes": total,
        "target_files": n_target,
    }
