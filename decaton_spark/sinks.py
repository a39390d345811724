"""Training-shard writer: the batch output stage of an LLM-data
pipeline — a deterministic global shuffle of the curated corpus laid
out as N balanced, individually-consumable parquet shards.

Why this exists (beyond-reference LLM-pipeline layer): trainers
consume data as a sequence of shard files, and they need

1. a *shuffled* order (no source/time locality inside a shard),
2. *reproducibility* (re-running the pipeline byte-identically
   reproduces every shard, so a training run can be resumed/audited),
3. *balance* (shards are the unit of data-parallel assignment).

All three come from one idea: order by a content-stable hash instead
of RNG. ``shard = md5(id) % N`` assigns each row a shard that never
changes across runs or engines; ``sortWithinPartitions(md5(id))``
makes the within-shard order the md5 order — a deterministic
pseudo-random permutation of the corpus (the same trick the
deterministic_split / docs_weighted_sample queries use for sampling).

Scale shape: exactly ONE shuffle (``repartition(N, shard)``), then a
local sort per shard — no global sort, no driver collect. At 100 TB
with N=8192 shards each reducer sorts ~12 GB, and
``maxRecordsPerFile`` caps file sizes below executor memory. The
``partitionBy("shard")`` layout gives readers directory-level
partition pruning (a trainer rank reads only its shard dirs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from decaton_spark.functions.hashing import md5_long


def with_shard(df: DataFrame, id_col: str, num_shards: int) -> DataFrame:
    """Append the content-stable shard id: md5(id) % num_shards.

    Uses the cross-engine md5->long fragment (functions/hashing.py) so
    a DuckDB/any-engine consumer recomputes identical assignments."""
    frag = md5_long(f"CAST({id_col} AS STRING)")
    return df.withColumn(
        "shard", F.expr(f"CAST({frag} % {num_shards} AS INT)")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    num_shards: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``path/shard=K/*.parquet``: one shuffle to
    co-locate each shard, a per-shard local sort by md5(id) for the
    deterministic shuffled order, directory layout for pruning."""
    sharded = (
        with_shard(df, id_col, num_shards)
        .repartition(num_shards, "shard")
        .sortWithinPartitions("shard", F.md5(F.col(id_col).cast("string")))
    )
    writer = sharded.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """One trainer rank's view: the shard filter prunes to that
    directory at planning time (PartitionFilters, no file listing of
    other shards' data)."""
    return spark.read.parquet(path).where(F.col("shard") == shard)
