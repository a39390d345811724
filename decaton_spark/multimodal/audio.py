"""Real audio codec path: WAV/PCM, dependency-free.

Companion to the BMP image path in ``columns.py``: RIFF/WAVE with
16-bit PCM is simple enough to parse with struct + numpy, so the audio
stages operate on REAL samples — decode (rate/channels/duration),
downmix, nearest-sample resample, and loudness features. Compressed
formats (mp3/ogg/aac) would need external codecs and stay out,
honestly — their calls drop into the same Arrow batch loops.

Scale shape: every stage is ``mapInPandas`` map work over binary
payloads — no shuffle, cost is the codec; partitioning and pushdown
behave exactly like the image stages.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def encode_wav(samples, sample_rate: int = 16_000) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a PCM WAV file."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()  # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes):
    """Decode a 16-bit PCM WAV to (sample_rate, (n, channels) int16
    array). Walks RIFF chunks (fmt may not be first); raises ValueError
    on non-PCM or malformed input."""
    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            if len(body) < clen:
                raise ValueError("truncated data chunk")
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    # `not rate` also rejects sample_rate=0 — a structurally-valid fmt
    # chunk value that would otherwise surface as ZeroDivisionError in
    # every duration/resample consumer (self-review r7)
    if not rate or data is None or not ch:
        raise ValueError("missing or degenerate fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    n = len(arr) // ch
    return rate, arr[: n * ch].reshape(n, ch).copy()


def decode_audio_wav(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sample_rate, n_channels, duration_ms, ok) from real WAV
    headers+data; corrupt payloads get ok=false, never an exception."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_channels int, duration_ms long, ok boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, chs, durs, oks = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(i))
                # compute EVERY output value before appending ANY: a
                # failure between appends would desynchronize the
                # per-column lists and kill the whole task on one bad
                # payload (self-review r7)
                try:
                    rate, arr = decode_wav(bytes(p))
                    row = (rate, arr.shape[1], round(1000 * arr.shape[0] / rate), True)
                except Exception:
                    row = (None, None, None, False)
                rates.append(row[0])
                chs.append(row[1])
                durs.append(row[2])
                oks.append(row[3])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_channels": pd.array(chs, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                    "ok": oks,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resample_audio_wav(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    target_rate: int = 16_000,
    mono: bool = True,
) -> DataFrame:
    """Real resample/downmix: decode, average channels to mono (the
    standard speech-model prep), nearest-sample rate conversion,
    re-encode. Undecodable payloads are dropped."""
    out_schema = f"{id_col} long, sample_rate int, n_samples long, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ns, payloads = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rate, arr = decode_wav(bytes(p))
                except Exception:
                    continue
                a = arr.astype(np.float64)
                if mono and a.shape[1] > 1:
                    a = a.mean(axis=1, keepdims=True)
                if a.shape[0] == 0:
                    # valid-but-empty data chunk: resampling empty audio
                    # is empty audio, not an IndexError (self-review r7)
                    n_out = 0
                    out = np.zeros((0, a.shape[1]), np.int16)
                else:
                    n_out = max(1, int(round(a.shape[0] * target_rate / rate)))
                    idx = (np.arange(n_out) * a.shape[0]) // n_out
                    out = np.clip(np.rint(a[idx]), -32768, 32767).astype(np.int16)
                ids.append(int(i))
                ns.append(n_out)
                payloads.append(encode_wav(out, sample_rate=target_rate))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "sample_rate": target_rate,
                        "n_samples": ns,
                        "payload": payloads,
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def audio_features_wav(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real loudness/activity features from decoded samples: RMS level,
    peak, zero-crossing rate, and silence ratio — the cheap signals an
    audio-curation pipeline filters on before any model runs."""
    out_schema = (
        f"{id_col} long, rms double, peak double, zero_cross_rate double,"
        " silence_ratio double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, rms, peak, zcr, sil = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _, arr = decode_wav(bytes(p))
                except Exception:
                    continue
                a = arr.astype(np.float64).mean(axis=1) / 32768.0
                if a.size == 0:
                    # empty data chunk: no samples → no features row
                    # (np reductions on zero-size arrays raise)
                    continue
                ids.append(int(i))
                rms.append(float(np.sqrt((a**2).mean())))
                peak.append(float(np.abs(a).max()))
                zcr.append(float((np.diff(np.signbit(a)) != 0).mean()) if len(a) > 1 else 0.0)
                sil.append(float((np.abs(a) < 0.01).mean()))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "rms": rms,
                        "peak": peak,
                        "zero_cross_rate": zcr,
                        "silence_ratio": sil,
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def audio_fingerprint_wav(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    n_frames: int = 33,
) -> DataFrame:
    """Perceptual audio fingerprint over REAL decoded samples: mono
    downmix → ``n_frames`` equal windows → RMS energy envelope →
    32 energy-gradient bits (frame i louder than frame i+1) — a
    chromaprint-style envelope hash robust to small noise, gain
    changes (gradients compare relative levels), and resampling
    (envelope shape is duration-relative). Near-identical recordings
    land within a few Hamming bits; reuse the image pipeline's
    banding pattern for candidate pairs at corpus scale.

    Arrow-batched mapInPandas; undecodable payloads yield ok=false.
    Returns (id, afp bigint, n_samples, ok)."""
    out_schema = f"{id_col} long, afp long, n_samples long, ok boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fps, ns, oks = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(i))
                try:
                    _, arr = decode_wav(bytes(p))
                    mono = arr.astype(np.float64).mean(axis=1)
                    n = len(mono)
                    if n < n_frames:
                        raise ValueError("too short to fingerprint")
                    edges = (np.arange(n_frames + 1) * n) // n_frames
                    rms = np.array(
                        [
                            np.sqrt(np.mean(mono[edges[k]:edges[k + 1]] ** 2))
                            for k in range(n_frames)
                        ]
                    )
                    bits = rms[:-1] > rms[1:]
                    v = 0
                    for b in bits:
                        v = (v << 1) | int(b)
                    fps.append(v)
                    ns.append(n)
                    oks.append(True)
                except Exception:
                    fps.append(None)
                    ns.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "afp": pd.array(fps, dtype="Int64"),
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "ok": oks,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
