"""Real-codec audio tests: WAV/PCM decode, downmix+resample, and
loudness features on actual samples."""

from __future__ import annotations

import numpy as np
import pytest

from decaton_spark.multimodal.audio import (
    audio_features_wav,
    decode_audio_wav,
    decode_wav,
    encode_wav,
    resample_audio_wav,
)


def _sine(freq, rate, secs, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)


@pytest.fixture(scope="module")
def audio(spark):
    rate = 8000
    stereo = np.stack([_sine(440, rate, 0.5), _sine(440, rate, 0.5)], axis=1)
    rows = [
        (1, encode_wav(_sine(440, rate, 1.0), sample_rate=rate)),
        (2, encode_wav(stereo, sample_rate=rate)),
        (3, encode_wav(np.zeros(4000, dtype=np.int16), sample_rate=rate)),
        (4, b"RIFFjunkWAVEnope"),
        (5, b"definitely not audio"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_rates_channels_duration(audio):
    out = {r["doc_id"]: r for r in decode_audio_wav(audio).collect()}
    assert (out[1]["sample_rate"], out[1]["n_channels"], out[1]["duration_ms"]) == (
        8000, 1, 1000,
    )
    assert (out[2]["n_channels"], out[2]["duration_ms"]) == (2, 500)
    assert out[3]["duration_ms"] == 500
    assert not out[4]["ok"] and not out[5]["ok"]


def test_resample_downmix(audio):
    out = {
        r["doc_id"]: r
        for r in resample_audio_wav(audio, target_rate=4000, mono=True).collect()
    }
    assert set(out) == {1, 2, 3}
    for r in out.values():
        rate, arr = decode_wav(bytes(r["payload"]))
        assert rate == 4000 and arr.shape[1] == 1
    # 1s @8k -> 4000 samples; 0.5s stereo -> 2000 mono samples
    assert out[1]["n_samples"] == 4000
    assert out[2]["n_samples"] == 2000


def test_loudness_features(audio):
    out = {r["doc_id"]: r for r in audio_features_wav(audio).collect()}
    assert set(out) == {1, 2, 3}
    # 0.5-amplitude sine: rms ~ 0.5/sqrt(2), peak ~0.5, near-zero silence
    assert out[1]["rms"] == pytest.approx(0.3536, abs=0.01)
    assert out[1]["peak"] == pytest.approx(0.5, abs=0.01)
    assert out[1]["silence_ratio"] < 0.05
    # 440 Hz at 8 kHz: ~880 crossings/s -> rate ~0.11
    assert out[1]["zero_cross_rate"] == pytest.approx(0.11, abs=0.01)
    # silence: zero rms/peak, full silence ratio
    assert out[3]["rms"] == 0.0 and out[3]["silence_ratio"] == 1.0


def test_chunk_walk_handles_extra_chunks():
    """fmt need not be the first chunk; LIST/INFO chunks are skipped."""
    body = encode_wav(_sine(100, 8000, 0.1), sample_rate=8000)
    # splice a LIST chunk between WAVE and fmt
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = body[:12] + extra + body[12:]
    # RIFF size field is now stale, but chunk walking doesn't rely on it
    rate, arr = decode_wav(spliced)
    assert rate == 8000 and arr.shape[0] == 800


def test_avi_frame_sampling(spark):
    """Real video path: uncompressed AVI decodes to actual frames, the
    sampler strides + caps them and emits standalone BMPs the image
    stages consume directly."""
    from decaton_spark.multimodal.video import decode_avi_dib, encode_avi_dib
    from decaton_spark.multimodal.columns import decode_bmp

    frames = np.stack(
        [np.full((6, 8, 3), i * 10, dtype=np.uint8) for i in range(12)]
    )
    rows = [
        (1, encode_avi_dib(frames, fps=6)),
        (2, b"RIFFxxxxAVI junk"),
        (3, b"not a container"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")

    from decaton_spark.multimodal.video import sample_frames_avi

    out = sample_frames_avi(media, every_n=2, max_frames=4).collect()
    by_idx = {r["frame_idx"]: r for r in out}
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 4  # 12 frames / stride 2 = 6, capped at 4
    for j, r in by_idx.items():
        w, h, arr = decode_bmp(bytes(r["frame"]))
        assert (w, h) == (8, 6)
        # frame j of the sampled stream is source frame 2j (solid 20j)
        assert (arr == np.uint8(20 * j)).all()

    fps, fs = decode_avi_dib(bytes(rows[0][1]))
    assert fps == 6 and len(fs) == 12


# --- property-based round-trips (no Spark session needed) ---

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    from decaton_spark.multimodal.columns import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    w2, h2, back = decode_bmp(encode_bmp(px))
    assert (w2, h2) == (w, h)
    assert (back == px).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 5000),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    rate2, back = decode_wav(encode_wav(samples, sample_rate=rate))
    assert rate2 == rate
    assert back.shape == (n, ch)
    assert (back == samples).all()


@settings(max_examples=20, deadline=None)
@given(
    nf=st.integers(1, 6),
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(nf, w, h, fps, seed):
    from decaton_spark.multimodal.video import decode_avi_dib, encode_avi_dib

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
    fps2, back = decode_avi_dib(encode_avi_dib(frames, fps=fps))
    assert fps2 == fps and len(back) == nf
    assert all((back[i] == frames[i]).all() for i in range(nf))


def test_audio_fingerprint_near_dup_vs_different(spark):
    """Envelope fingerprint over real samples: a lightly-noised copy of
    a signal stays within a few Hamming bits; a different envelope
    (reversed amplitude ramp) lands far away; gain change is invariant;
    corrupt payloads report ok=false."""
    import numpy as np

    from decaton_spark.multimodal.audio import (
        audio_fingerprint_wav,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    t = np.arange(16_000)
    ramp_up = (t / len(t)) * 12_000
    base = (np.sin(t * 0.05) * ramp_up).astype(np.int16)
    noised = (base + rng.integers(-200, 200, len(t))).astype(np.int16)
    half_gain = (base // 2).astype(np.int16)
    reversed_env = base[::-1].copy()

    rows = [
        (0, bytearray(encode_wav(base))),
        (1, bytearray(encode_wav(noised))),
        (2, bytearray(encode_wav(half_gain))),
        (3, bytearray(encode_wav(reversed_env))),
        (4, bytearray(b"RIFFgarbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = {r["doc_id"]: r for r in audio_fingerprint_wav(df).collect()}

    assert fp[4]["ok"] is False
    ham = lambda a, b: bin((fp[a]["afp"] ^ fp[b]["afp"]) & (2**64 - 1)).count("1")
    assert ham(0, 1) <= 4, "noise must not move the envelope hash far"
    assert ham(0, 2) <= 4, "gain change is envelope-invariant"
    assert ham(0, 3) >= 12, "reversed envelope must be far"


def test_degenerate_wavs_never_crash_the_task(spark):
    """Self-review r7 regression pins: a sample_rate=0 fmt chunk and a
    zero-length data chunk are DATA problems, not job-killers — every
    audio stage must drop or flag them, never raise."""
    import struct

    # structurally valid WAV whose fmt carries sample_rate=0
    zero_rate = bytearray(encode_wav(_sine(440, 8000, 0.1), sample_rate=8000))
    # fmt chunk: RIFF(12) + 'fmt '(4) + len(4) + fmt(2) + ch(2) + rate(4)
    struct.pack_into("<I", zero_rate, 12 + 8 + 4, 0)
    # valid WAV with ZERO samples
    empty = encode_wav(np.zeros((0, 1), dtype=np.int16), sample_rate=8000)
    df = spark.createDataFrame(
        [(1, bytes(zero_rate)), (2, empty), (3, encode_wav(_sine(440, 8000, 0.1)))],
        "doc_id long, payload binary",
    )
    meta = {r["doc_id"]: r for r in decode_audio_wav(df).collect()}
    assert meta[1]["ok"] is False          # rate=0 rejected, not divided by
    assert meta[2]["ok"] is True           # empty audio is decodable
    assert meta[2]["duration_ms"] == 0
    assert meta[3]["ok"] is True
    res = {r["doc_id"]: r for r in resample_audio_wav(df).collect()}
    assert 1 not in res                    # undecodable -> dropped
    assert res[2]["n_samples"] == 0        # empty resamples to empty
    assert res[3]["n_samples"] > 0
    feats = {r["doc_id"]: r for r in audio_features_wav(df).collect()}
    assert 1 not in feats and 2 not in feats  # no features from no samples
    assert feats[3]["rms"] > 0
