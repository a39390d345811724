"""Real video codec path: uncompressed AVI (DIB frames), dependency-free.

The RIFF container again (see audio.py's WAV walker), so real frame
extraction needs no ffmpeg: walk RIFF/LIST chunks to the 'movi' list,
collect '##db'/'##dc' frame chunks, and decode each as a bottom-up BGR
DIB using dimensions from 'strf' (a BITMAPINFOHEADER). Sampled frames
re-encode as standalone BMPs so the image stages (decode / resize /
featurize) compose directly downstream. Compressed codecs stay
honestly out — their decode calls drop into the same batch loop.

Scale shape: frame sampling is pure ``mapInPandas`` map work — no
shuffle; output row count is bounded by ``max_frames`` per video.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_avi_dib(frames, fps: int = 10) -> bytes:
    """Encode (n_frames, H, W, 3) uint8 RGB as an uncompressed AVI."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    nf, h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h
    pad = b"\x00" * (stride - w * 3)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0x10, nf, 0, 1, frame_size, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, nf, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_frames = []
    for f in range(nf):
        rows = [arr[f, y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)]
        movi_frames.append(chunk(b"00db", b"".join(rows)))
    movi = lst(b"movi", b"".join(movi_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_dib(payload: bytes):
    """Decode an uncompressed AVI to (fps, [(H, W, 3) uint8 RGB, ...]).
    Raises ValueError for non-AVI or compressed streams."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    dims: list = [None, None, None, True]  # w, h, fps, bottom_up

    def walk(buf: bytes, out_frames: list) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                raise ValueError("truncated chunk")
            if cid == b"LIST":
                walk(body[4:], out_frames)
            elif cid == b"strh":
                if body[:4] == b"vids" and body[4:8] not in (b"DIB ", b"\x00" * 4):
                    raise ValueError("compressed video stream")
                scale = struct.unpack_from("<I", body, 20)[0]
                rate = struct.unpack_from("<I", body, 24)[0]
                if scale:
                    dims[2] = rate // scale
            elif cid == b"strf" and dims[0] is None:
                _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", body, 0)
                if bpp != 24 or comp != 0:
                    raise ValueError("unsupported frame format")
                dims[0], dims[1], dims[3] = w, abs(h), h > 0
            elif cid[2:4] in (b"db", b"dc") and dims[0] is not None:
                w, h = dims[0], dims[1]
                stride = (w * 3 + 3) & ~3
                if len(body) < stride * h:
                    raise ValueError("truncated frame")
                buf2 = np.frombuffer(body, dtype=np.uint8, count=stride * h)
                rows = buf2.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                # biHeight sign picks row order (same rule as
                # decode_bmp): positive = bottom-up (flip), negative =
                # top-down (already in display order — flipping would
                # silently mirror the frame, self-review r7)
                if dims[3]:
                    rows = rows[::-1]
                out_frames.append(rows[:, :, ::-1].copy())  # BGR->RGB
            pos += 8 + clen + (clen & 1)

    frames: list = []
    walk(payload[12:], frames)
    if dims[0] is None or not frames:
        raise ValueError("no video stream found")
    return (dims[2] or 0), frames


def sample_frames_avi(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    every_n: int = 1,
    max_frames: int = 8,
) -> DataFrame:
    """Real frame sampling: decode the AVI, keep every ``every_n``-th
    frame up to ``max_frames``, emit each as a standalone BMP payload
    ready for the image stages (decode/resize/featurize compose
    downstream). Corrupt/compressed payloads are dropped."""
    from decaton_spark.multimodal.columns import encode_bmp

    out_schema = f"{id_col} long, frame_idx int, width int, height int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, frames = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _, fs = decode_avi_dib(bytes(p))
                except Exception:
                    continue
                for j, arr in enumerate(fs[:: max(1, every_n)][:max_frames]):
                    ids.append(int(i))
                    idxs.append(j)
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    frames.append(encode_bmp(arr))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "frame_idx": idxs,
                        "width": ws,
                        "height": hs,
                        "frame": frames,
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def video_frame_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    every_n: int = 1,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-level perceptual hashes for a video column: real AVI
    frame extraction composed with the image dHash stage — the
    video-dedup primitive (two videos are near-dups when most sampled
    frames match within a few Hamming bits; join on banded frame
    hashes exactly like ``image_near_dup_pairs``). Returns
    (id, frame_idx, dhash, ok)."""
    from decaton_spark.multimodal.columns import image_dhash

    frames = sample_frames_avi(
        df, payload_col, id_col, every_n=every_n, max_frames=max_frames
    )
    # composite row id keeps (video, frame) addressable through the
    # single-id image stage; 1e6 frames/video is far above max_frames.
    # The pack must not overflow BIGINT (|doc_id| < 2^63/1e6 ≈ 9.2e12 —
    # raise loudly, a wrapped id silently attributes hashes to the
    # wrong video), and the unpack uses exact integer arithmetic:
    # pmod is the frame (always in [0, 1e6)), and (fid - pmod) div 1e6
    # is the doc — floor semantics, correct for negative doc_ids where
    # a double divide or trunc-div would decode the wrong pair
    # (self-review r7).
    lim = 9_223_372_036_854  # floor(2^63 / 1e6)
    fid = (
        F.when(
            # two-sided bounds, NOT abs(): under non-ANSI Spark
            # abs(Long.MIN_VALUE) wraps negative, passes an abs()<lim
            # check, and the multiply overflows silently — the exact
            # wrong-video attribution this guard exists to prevent
            # (ADVICE r7)
            (F.col(id_col) > F.lit(-lim)) & (F.col(id_col) < F.lit(lim)),
            F.col(id_col) * 1_000_000 + F.col("frame_idx"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("video_frame_dhash: doc_id out of packable range: "),
                    F.col(id_col).cast("string"),
                )
            )
        )
        .alias("fid")
    )
    hashed = image_dhash(
        frames.select(fid, F.col("frame").alias("payload")),
        payload_col="payload",
        id_col="fid",
    )
    return hashed.select(
        F.expr("(fid - pmod(fid, 1000000)) div 1000000")
        .cast("long")
        .alias(id_col),
        F.expr("pmod(fid, 1000000)").cast("int").alias("frame_idx"),
        "dhash",
        "ok",
    )
