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
