"""Training-shard writer (sinks.py): determinism, balance, order,
and partition pruning."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from decaton_spark.sinks import read_shard, with_shard, write_training_shards
from decaton_spark.sources import load_table

N = 8


def _docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "text", "source")


def test_shards_deterministic_across_runs(spark, sf_dir, tmp_path):
    """Two independent writes produce identical shard contents in
    identical within-shard order — the reproducibility contract."""
    docs = _docs(spark, sf_dir)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, num_shards=N)
    write_training_shards(docs, b, num_shards=N)
    for shard in range(N):
        ra = [r["doc_id"] for r in read_shard(spark, a, shard).collect()]
        rb = [r["doc_id"] for r in read_shard(spark, b, shard).collect()]
        assert ra == rb and len(ra) > 0, f"shard {shard}"


def test_shards_partition_complete_and_balanced(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "out")
    write_training_shards(docs, out, num_shards=N)
    back = spark.read.parquet(out)
    n_src = docs.count()
    assert back.count() == n_src  # no row lost or duplicated
    assert back.select("doc_id").distinct().count() == n_src
    sizes = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(sizes) == set(range(N))
    # md5 is uniform: worst shard within 2x of ideal at 500 rows
    ideal = n_src / N
    assert max(sizes.values()) < 2 * ideal, sizes
    assert min(sizes.values()) > ideal / 2, sizes


def test_within_shard_order_is_md5_order(spark, sf_dir, tmp_path):
    """Reading a shard front-to-back yields the content-hash order —
    the deterministic 'global shuffle' trainers consume."""
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "out")
    write_training_shards(docs, out, num_shards=N)
    rows = read_shard(spark, out, 3).collect()
    hashes = [
        r["h"]
        for r in spark.createDataFrame([(x["doc_id"],) for x in rows], ["doc_id"])
        .select(F.md5(F.col("doc_id").cast("string")).alias("h"))
        .collect()
    ]
    assert hashes == sorted(hashes)


def test_shard_read_prunes_partitions(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "out")
    write_training_shards(docs, out, num_shards=N)
    plan = (
        read_shard(spark, out, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters")[1][:200]


def test_max_records_per_file_splits_files(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "out")
    write_training_shards(docs, out, num_shards=2, max_records_per_file=50)
    files = glob.glob(os.path.join(out, "shard=0", "*.parquet"))
    # ~250 rows/shard at 50 rows/file => multiple files
    assert len(files) >= 3, files


def test_shard_assignment_matches_oracle(spark, duck, sf_dir):
    """Cross-engine: DuckDB recomputes identical shard ids from the
    same md5 fragment (the hashing.py cross-engine contract)."""
    from decaton_spark.functions.hashing import md5_long

    docs = _docs(spark, sf_dir)
    got = {
        r["doc_id"]: r["shard"]
        for r in with_shard(docs, "doc_id", N).select("doc_id", "shard").collect()
    }
    frag = md5_long("CAST(doc_id AS VARCHAR)")
    oracle = {
        int(d): int(s)
        for d, s in duck.sql(
            f"SELECT doc_id, CAST({frag} % {N} AS INT) FROM documents"
        ).fetchall()
    }
    assert got == oracle
