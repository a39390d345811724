"""Real-codec multimodal tests: the BMP backend decodes, resamples,
and featurizes ACTUAL pixel data (no image library needed), so the
media pipeline stages are exercised end-to-end with ground truth."""

from __future__ import annotations

import numpy as np
import pytest

from decaton_spark.multimodal import (
    decode_bmp,
    decode_images_bmp,
    encode_bmp,
    extract_features_bmp,
    resize_images_bmp,
)


def _solid(w, h, rgb):
    return encode_bmp(np.full((h, w, 3), rgb, dtype=np.uint8))


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, _solid(16, 8, (255, 0, 0))),
        (2, _solid(32, 32, (0, 255, 0))),
        (3, encode_bmp(np.arange(24 * 10 * 3, dtype=np.uint8).reshape(10, 24, 3))),
        (4, b"not an image at all"),
        (5, _solid(8, 8, (0, 0, 255))[:40]),  # truncated header/pixels
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_real_dimensions_and_corrupt_handling(media):
    out = {r["doc_id"]: r for r in decode_images_bmp(media).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["ok"]) == (16, 8, True)
    assert (out[2]["width"], out[2]["height"]) == (32, 32)
    assert (out[3]["width"], out[3]["height"]) == (24, 10)
    assert not out[4]["ok"] and out[4]["width"] is None
    assert not out[5]["ok"], "truncated pixel array must not decode"


def test_resize_real_pixels(media, spark):
    out = {r["doc_id"]: r for r in resize_images_bmp(media, target_w=8, target_h=8).collect()}
    # corrupt payloads are dropped, valid ones land at target size
    assert set(out) == {1, 2, 3}
    for r in out.values():
        w, h, arr = decode_bmp(bytes(r["payload"]))
        assert (w, h) == (8, 8)
    # solid red stays solid red through resample + re-encode
    _, _, arr = decode_bmp(bytes(out[1]["payload"]))
    assert (arr == np.array([255, 0, 0], dtype=np.uint8)).all()


def test_features_reflect_pixel_statistics(media):
    out = {r["doc_id"]: r["features"] for r in extract_features_bmp(media).collect()}
    assert set(out) == {1, 2, 3}
    r, g, b = out[1][:3]
    assert r == pytest.approx(1.0) and g == 0.0 and b == 0.0
    assert out[1][3:6] == [0.0, 0.0, 0.0]  # solid color: zero std
    g2 = out[2][:3]
    assert g2[1] == pytest.approx(1.0) and g2[0] == 0.0


def test_roundtrip_gradient_exact():
    px = np.arange(31 * 7 * 3, dtype=np.uint8).reshape(7, 31, 3)  # odd stride
    w, h, back = decode_bmp(encode_bmp(px))
    assert (w, h) == (31, 7)
    assert (back == px).all()


def test_image_dhash_near_dup_pairs(spark):
    """Perceptual dedup over real pixels: a mild perturbation of an
    image stays within 3 Hamming bits of the original (pair found);
    a structurally different image does not pair with either; corrupt
    payloads are excluded via ok=false."""
    import numpy as np

    from decaton_spark.multimodal.columns import (
        encode_bmp,
        image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    # smooth horizontal gradient structure so dhash is stable
    ramp = np.linspace(0, 200, 48, dtype=np.uint8)[None, :, None]
    img_a = np.clip(base // 4 + ramp, 0, 255).astype(np.uint8)
    img_b = img_a.copy()
    img_b[:2, :2] = 255  # tiny corner change: visually near-identical
    img_c = img_a[:, ::-1].copy()  # mirrored: different gradient signs

    rows = [
        (0, bytearray(encode_bmp(img_a))),
        (1, bytearray(encode_bmp(img_b))),
        (2, bytearray(encode_bmp(img_c))),
        (3, bytearray(b"not a bmp at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    hashes = {r["doc_id"]: r for r in image_dhash(df).collect()}
    assert hashes[3]["ok"] is False and hashes[3]["dhash"] is None
    assert all(hashes[i]["ok"] for i in (0, 1, 2))

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(df).collect()
    }
    assert (0, 1) in pairs, "perturbed copy must pair with the original"
    assert pairs[(0, 1)] <= 3
    assert (0, 2) not in pairs and (1, 2) not in pairs, (
        "mirrored image must not pair"
    )


def test_video_frame_dhash_identifies_shared_frames(spark):
    """Video dedup primitive: two clips sharing their frames (one
    lightly perturbed) produce frame hashes within 3 Hamming bits
    per frame; an unrelated clip's frames do not match."""
    import numpy as np

    from decaton_spark.multimodal.video import encode_avi_dib, video_frame_dhash

    rng = np.random.default_rng(3)
    ramp = np.linspace(0, 200, 48, dtype=np.uint8)[None, :, None]
    frames_a = [
        np.clip(
            rng.integers(0, 60, size=(32, 48, 3), dtype=np.uint8) + ramp, 0, 255
        ).astype(np.uint8)
        for _ in range(3)
    ]
    frames_b = [f.copy() for f in frames_a]
    for f in frames_b:
        f[:2, :2] = 255  # tiny perturbation per frame
    frames_c = [f[:, ::-1].copy() for f in frames_a]  # mirrored clip

    rows = [
        (0, bytearray(encode_avi_dib(frames_a))),
        (1, bytearray(encode_avi_dib(frames_b))),
        (2, bytearray(encode_avi_dib(frames_c))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = video_frame_dhash(df).collect()
    h = {(r["doc_id"], r["frame_idx"]): r["dhash"] for r in out}
    assert len(h) == 9 and all(r["ok"] for r in out)
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    for i in range(3):
        assert ham(h[(0, i)], h[(1, i)]) <= 3, "perturbed frames must match"
        assert ham(h[(0, i)], h[(2, i)]) >= 8, "mirrored frames must not"


def test_avi_top_down_frames_not_mirrored():
    """Self-review r7: a top-down AVI (negative strf biHeight) is
    already in display order — flipping it mirrored every frame and
    silently broke frame-dedup pairing. Flip only bottom-up DIBs."""
    import struct

    import numpy as np

    from decaton_spark.multimodal.video import decode_avi_dib, encode_avi_dib

    frame = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(1, 2, 3, 3)
    payload = bytearray(encode_avi_dib(frame))
    _, frames_up = decode_avi_dib(bytes(payload))
    assert np.array_equal(frames_up[0], frame[0])
    # rewrite strf biHeight to negative (top-down) and re-order the rows
    # of the stored frame to display order: decoded output must match
    # the bottom-up decode exactly
    idx = bytes(payload).find(struct.pack("<Iii", 40, 3, 2))
    assert idx > 0, "strf header not found"
    struct.pack_into("<i", payload, idx + 8, -2)
    # the single '00db' frame body: flip its row order in place
    fidx = bytes(payload).find(b"00db")
    stride = (3 * 3 + 3) & ~3
    body = payload[fidx + 8 : fidx + 8 + stride * 2]
    payload[fidx + 8 : fidx + 8 + stride * 2] = body[stride:] + body[:stride]
    _, frames_down = decode_avi_dib(bytes(payload))
    assert np.array_equal(frames_down[0], frame[0])


def test_video_frame_dhash_composite_id_handles_negative_ids(spark):
    """Self-review r7: the (doc_id, frame_idx) pack/unpack must be exact
    integer arithmetic — a double divide or trunc-div decodes negative
    doc_ids to the wrong (id, frame) pair."""
    import numpy as np

    from decaton_spark.multimodal.video import encode_avi_dib, video_frame_dhash

    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    frames[1, :, :2] = 255
    df = spark.createDataFrame(
        [(-1, encode_avi_dib(frames)), (7, encode_avi_dib(frames))],
        "doc_id long, payload binary",
    )
    got = sorted(
        (r["doc_id"], r["frame_idx"]) for r in video_frame_dhash(df).collect()
    )
    assert got == [(-1, 0), (-1, 1), (7, 0), (7, 1)]


def test_image_near_dup_pairs_rejects_uncovered_hamming():
    """4x16-bit banding is pigeonhole-complete only to 3 bits; looser
    thresholds must refuse rather than silently under-report."""
    import pytest

    from decaton_spark.multimodal.columns import image_near_dup_pairs

    with pytest.raises(ValueError, match="max_hamming"):
        image_near_dup_pairs(None, max_hamming=4)
