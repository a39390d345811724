from decaton_spark.sources.files import FORMATS, compact_small_files, read_table, write_table
from decaton_spark.sources.parquet import (
    TABLES,
    fixture_fingerprint,
    load_table,
    load_tables,
    register_views,
    scan_bytes,
    spread_partitions,
)

__all__ = [
    "FORMATS",
    "TABLES",
    "fixture_fingerprint",
    "load_table",
    "load_tables",
    "compact_small_files",
    "read_table",
    "register_views",
    "scan_bytes",
    "spread_partitions",
    "write_table",
]
