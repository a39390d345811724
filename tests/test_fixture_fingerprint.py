"""Snapshot-fingerprint keying for per-dataset caches (ADVICE r6).

The bitext LSH corpus-size probe and the trained-centroid store both
memoize a per-dataset artifact. Both must invalidate when a fixture is
regenerated IN PLACE at the same path (same name, new contents) —
otherwise the Spark-side plan is built from stale parameters while the
DuckDB oracle recomputes live, a guaranteed spurious mismatch.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from decaton_spark.functions import similarity as sim
from decaton_spark.queries import _bitext_corpus_count
from decaton_spark.sources import fixture_fingerprint


def _write_embeddings(path: str, n: int, scale: float = 1.0) -> None:
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "label": pa.array([i % 4 for i in range(n)], type=pa.int64()),
            "embedding": pa.array(
                [[float(i % 7 + 1) * scale] * 8 for i in range(n)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, path)


def _overwrite_in_place(write, path: str, *args) -> None:
    """Rewrite ``path`` ensuring the (size, mtime_ns) pair moves even on
    coarse-mtime filesystems."""
    before = os.stat(path)
    write(path, *args)
    if os.stat(path).st_mtime_ns == before.st_mtime_ns:
        os.utime(path, ns=(before.st_atime_ns, before.st_mtime_ns + 1))


def test_fingerprint_tracks_in_place_rewrite(tmp_path):
    p = str(tmp_path / "embeddings.parquet")
    _write_embeddings(p, 10)
    a = fixture_fingerprint(p)
    _overwrite_in_place(_write_embeddings, p, 25)
    b = fixture_fingerprint(p)
    assert a != b
    assert fixture_fingerprint(str(tmp_path / "missing")) == "absent"
    # directory form: digest covers contained files
    d = tmp_path / "ds"
    d.mkdir()
    _write_embeddings(str(d / "part-0.parquet"), 5)
    da = fixture_fingerprint(str(d))
    _overwrite_in_place(_write_embeddings, str(d / "part-0.parquet"), 6)
    assert fixture_fingerprint(str(d)) != da


def test_bitext_count_cache_invalidates_on_swap(spark, tmp_path):
    """An in-place dataset swap cannot produce a stale-bucket plan: the
    cached corpus count follows the snapshot, so the derived LSH bucket
    bits move with the data exactly as the oracle's live count does."""
    sf_dir = str(tmp_path)
    p = f"{sf_dir}/embeddings.parquet"
    _write_embeddings(p, 12)
    assert _bitext_corpus_count(spark, sf_dir) == 12
    # second call: cache hit (no requirement it recounts — just correct)
    assert _bitext_corpus_count(spark, sf_dir) == 12
    _overwrite_in_place(_write_embeddings, p, 40)
    assert _bitext_corpus_count(spark, sf_dir) == 40


def test_pq_seed_books_invalidate_on_swap(spark, tmp_path):
    """The PQ seed-book cache collects real vectors, so an in-place
    fixture regeneration must serve freshly-seeded books (self-review
    round 7: _pq_books had the same sf_dir-only key this change removed
    from the bitext/centroid caches)."""
    from decaton_spark.queries import _pq_books

    sf_dir = str(tmp_path)
    p = f"{sf_dir}/embeddings.parquet"
    _write_embeddings(p, 64)
    a = _pq_books(spark.read.parquet(p), sf_dir)
    _overwrite_in_place(_write_embeddings, p, 64, 2.0)
    b = _pq_books(spark.read.parquet(p), sf_dir)
    assert a != b  # books re-seeded from the new vectors


def test_centroid_store_invalidates_on_swap(spark, tmp_path, monkeypatch):
    """trained_centroids retrains when the dataset snapshot changes —
    the on-disk artifact is keyed by fingerprint, so the stale JSON is
    not reused."""
    monkeypatch.setattr(sim, "_CENTROID_DIR", str(tmp_path / "store"))
    ds = str(tmp_path / "embeddings")
    p = f"{ds}.parquet"
    _write_embeddings(p, 64)
    df = spark.read.parquet(p)
    a = sim.trained_centroids(df, dataset=ds, nlist=4, iters=1)
    _overwrite_in_place(_write_embeddings, p, 64)
    # same row count, new snapshot -> new key; a fresh training run must
    # happen, and the stale artifact under the OLD fingerprint tag is
    # swept rather than accumulating forever (ADVICE r7) — exactly one
    # artifact remains, named with the new fingerprint hash
    df2 = spark.read.parquet(p)
    b = sim.trained_centroids(df2, dataset=ds, nlist=4, iters=1)
    files = list((tmp_path / "store").iterdir())
    assert len(files) == 1, files
    import hashlib

    from decaton_spark.sources import fixture_fingerprint

    fp2 = hashlib.md5(fixture_fingerprint(p).encode()).hexdigest()[:12]
    assert fp2 in files[0].name
    # deterministic training on identical contents -> identical result
    assert a == b


def test_artifact_sweep_spares_other_datasets(tmp_path, monkeypatch):
    """The stale-tag sweep only removes current-format siblings of the
    SAME dataset: artifacts for other datasets (different dataset
    hash) and the current fingerprint's own artifacts are untouched
    (ADVICE r7). Fingerprint segments here must be format-valid hex —
    since round 9 a non-hex name is (correctly) swept as a pre-r8
    legacy leftover, which test_similarity pins separately."""
    store = tmp_path / "store"
    store.mkdir()
    monkeypatch.setattr(sim, "_CENTROID_DIR", str(store))
    import hashlib

    dhash = hashlib.md5(b"dsA").hexdigest()[:12]
    other = hashlib.md5(b"dsB").hexdigest()[:12]
    oldfp = "0" * 12
    (store / f"{dhash}_{oldfp}_n4_i1.json").write_text("[]")
    (store / f"{other}_{oldfp}_n4_i1.json").write_text("[]")
    path = sim._artifact_path("dsA", "fp-new", "n4_i1")
    fphash = hashlib.md5(b"fp-new").hexdigest()[:12]
    names = sorted(f.name for f in store.iterdir())
    # dsA's stale tag swept; dsB untouched; returned path uses new tag
    assert names == [f"{other}_{oldfp}_n4_i1.json"]
    assert path.endswith(f"{dhash}_{fphash}_n4_i1.json")
