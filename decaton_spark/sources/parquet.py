"""Parquet batch source helpers for the driver's TPC-H-ish fixture tables.

At 100 TB these would be partitioned/bucketed parquet (or Iceberg/Delta)
scans; loading stays a plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown, column pruning, and partition pruning — nothing here
materializes or caches eagerly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fixture_fingerprint(path: str) -> str:
    """Snapshot fingerprint of a fixture dataset path (file or
    directory): a stable digest of every file's (relative path, size,
    mtime_ns). Caches that memoize per-dataset derived values (the
    bitext corpus-size probe, the trained-centroid store) key on this
    so an in-place regeneration of the same path — same name, new
    contents — invalidates the cached value instead of silently
    reusing a stale one. Missing paths fingerprint as "absent" rather
    than raising, so plan-only callers degrade to a per-path key.
    """
    import hashlib

    entries: list[tuple[str, int, int]] = []
    if os.path.isfile(path):
        st = os.stat(path)
        entries.append(("", st.st_size, st.st_mtime_ns))
    elif os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for fname in files:
                fp = os.path.join(root, fname)
                st = os.stat(fp)
                entries.append(
                    (os.path.relpath(fp, path), st.st_size, st.st_mtime_ns)
                )
        entries.sort()
    else:
        return "absent"
    h = hashlib.md5()
    for rel, size, mtime in entries:
        h.update(f"{rel}\x00{size}\x00{mtime}\x00".encode())
    return h.hexdigest()[:16]


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # build it surfaces either as a long of epoch-nanos (legacy
        # nanosAsLong flag honored) or as TIMESTAMP_NTZ (4.1+ native
        # read, truncated to micros). Normalize both to a microsecond
        # TimestampType column holding the same instant regardless of
        # the caller session's timezone: the NTZ wall clock IS the UTC
        # instant, so take a pure NTZ diff from the NTZ epoch (no tz
        # involved) and rebuild via timestamp_micros (epoch-based).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            ),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def spread_partitions(
    spark: SparkSession,
    df: DataFrame,
    *,
    target_bytes: int = 2 << 20,
) -> int | None:
    """Scale-adaptive spread width for a CPU-heavy projection over
    ``df``'s scan: enough partitions to keep ~``target_bytes`` of
    compressed input per task, capped at the session's core count,
    or None when the input is too small to be worth an exchange.

    This is guide §2's "derive partitioning from input size, not a
    constant tuned for either local mode or the cluster": a single
    low-row-group parquet file otherwise pins the whole stage to one
    task regardless of cores (round-9 stage audit), while an
    unconditional core-count spread taxes small inputs with per-task
    overhead (measured +0.9 s on the sf0.1 novelty wall for ~1.5 s of
    total work). Driver-side file listing only — no job runs.
    """
    nbytes = scan_bytes(spark, df)
    if nbytes is None:
        # unreadable size: do NOT spread — an unconditional
        # full-width exchange on a possibly-tiny input is the
        # exact failure mode this helper exists to avoid
        return None
    n = min(spark.sparkContext.defaultParallelism, nbytes // target_bytes)
    return int(n) if n > 1 else None


def scan_bytes(spark: SparkSession, df: DataFrame) -> int | None:
    """Total compressed bytes of ``df``'s underlying scan files, or
    None when any file's size is unreadable. Driver-side listing only
    — no job runs. Derived frames with no file scans report 0."""
    nbytes = 0
    for f in df.inputFiles():
        path = f[7:] if f.startswith("file://") else f
        try:
            nbytes += os.path.getsize(path)
        except OSError:
            # non-posix path (s3://, hdfs://, …): ask the Hadoop
            # FileSystem for the real size instead of guessing
            try:
                jvm = spark._jvm
                jpath = jvm.org.apache.hadoop.fs.Path(f)
                fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
                nbytes += fs.getFileStatus(jpath).getLen()
            except Exception:
                return None
    return nbytes


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, prefix: str = ""
) -> list[str]:
    """Register every fixture table as a temp view so users can drive
    the engine with raw ``spark.sql(...)`` — the full Spark SQL surface
    (joins, windows, grouping sets, subqueries) over the same data the
    DataFrame operators read. Returns the registered view names."""
    names = []
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(prefix + t)
        names.append(prefix + t)
    return names
