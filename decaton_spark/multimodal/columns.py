"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract for a 100 TB media pipeline:

- payload is a ``binary`` column (or a (path, range) pointer for blobs
  too large to inline), never decoded until the last possible stage;
- typed metadata travels in a struct column so pruning/filtering
  happens on the scan (reject by mime/size/dims without touching bytes);
- decode / feature-extract / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — the batch shape, schema, and partitioning
  here are real and tested; the actual codec calls are STUBBED
  (``decode_backend="fake"`` is deterministic; ``"pil"``/``"ffmpeg"``
  raise NotImplementedError — those libs aren't in this container).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload", mime: str = "application/octet-stream") -> DataFrame:
    """Cheap, expression-only metadata (no decode): size + digest.
    Width/height/duration are decode-time fields, left null here."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.sha1(p).alias("sha1"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derive (w, h) from
    the content digest so tests are stable."""
    h = hashlib.sha1(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    backend: str = "fake",
    batch_note: str = "arrow",
) -> DataFrame:
    """Decode stage: (id, width, height, ok). Arrow-batched mapInPandas —
    one python worker call per ~10k-row batch, not per row."""
    if backend not in ("fake", "pil"):
        raise ValueError(f"unknown backend {backend!r}")

    out_schema = f"{id_col} long, width int, height int, ok boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if backend == "pil":
            raise NotImplementedError(
                "PIL is not available in this container; plug the real "
                "decoder here — the batch plumbing is identical"
            )
        for pdf in batches:
            dims = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "ok": True,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    dim: int = 8,
) -> DataFrame:
    """Feature-extraction stage: deterministic pseudo-embedding from the
    payload digest (the real model call swaps into the same batch loop)."""
    out_schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                digest = hashlib.sha256(bytes(p)).digest()
                feats.append([digest[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling stage shape: one output row per sampled frame
    (video decode stubbed as byte-strided slices)."""
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                for j in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(int(i))
                    idxs.append(j)
                    frames.append(raw[j * every_n_bytes : (j + 1) * every_n_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    target_w: int = 224,
    target_h: int = 224,
    backend: str = "fake",
) -> DataFrame:
    """Resize stage: (id, width, height, payload) at the target size.

    Real pipelines drop a PIL/libvips call into the batch loop; the
    fake backend emits a deterministic payload (digest-seeded, length
    ∝ target area) so downstream schema/partitioning logic is testable.
    Output partitioning mirrors the input — no shuffle is introduced;
    at 100 TB this stage is pure map work whose cost is the codec, not
    the engine.
    """
    if backend not in ("fake", "pil"):
        raise ValueError(f"unknown backend {backend!r}")

    out_schema = f"{id_col} long, width int, height int, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if backend == "pil":
            raise NotImplementedError(
                "PIL is not available in this container; plug the real "
                "resize into this batch loop"
            )
        for pdf in batches:
            payloads = []
            for p in pdf[payload_col]:
                digest = hashlib.sha1(bytes(p)).digest()
                # deterministic fake pixel buffer: digest tiled to area/64
                reps = max(1, (target_w * target_h) // (64 * len(digest)))
                payloads.append(digest * reps)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "payload": payloads,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
