"""Native PNG codec: filter-by-filter round trips, real-world decode,
resize, and the multimodal decode chain preferring it over the fake."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from data_integration_pipelines_spark.operators.png_lite import (
    decode_png,
    encode_png,
    resize_nearest,
)

_SYSTEM_PNGS = glob.glob(
    "/root/.pyenv/versions/*/lib/python*/idlelib/Icons/idle_32.png"
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(5, 9), (4, 6, 3), (3, 3, 4), (1, 1, 3)])
def test_roundtrip_every_filter(shape, filter_type):
    rng = np.random.default_rng(hash((shape, filter_type)) % 2**32)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img, filter_type=filter_type))
    want = img[:, :, None] if img.ndim == 2 else img
    np.testing.assert_array_equal(back, want)


def test_rejects_garbage_and_bad_shapes():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all----")
    with pytest.raises(ValueError, match="channel count"):
        encode_png(np.zeros((2, 2, 5), dtype=np.uint8))
    with pytest.raises(ValueError, match="filter type"):
        encode_png(np.zeros((2, 2), dtype=np.uint8), filter_type=7)


@pytest.mark.skipif(not _SYSTEM_PNGS, reason="no system PNG found")
def test_decodes_libpng_written_file():
    """Conformance beyond self-round-trip: a PNG written by a real
    encoder (adaptive per-row filters, multi-IDAT possible)."""
    arr = decode_png(open(_SYSTEM_PNGS[0], "rb").read())
    assert arr.shape == (32, 32, 4)
    assert arr.dtype == np.uint8


def test_resize_nearest_identity_and_downscale():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    np.testing.assert_array_equal(resize_nearest(img, (4, 4)), img)
    half = resize_nearest(img, (2, 2))
    assert half.shape == (2, 2, 3)
    np.testing.assert_array_equal(half[0, 0], img[0, 0])


def test_decode_chain_prefers_native_png(spark):
    """extract_image_features must report the PNG's REAL dims, not the
    digest fake's, with no PIL in the environment."""
    from data_integration_pipelines_spark.operators.multimodal import (
        extract_image_features,
    )

    img = np.full((6, 5, 3), 200, dtype=np.uint8)
    png = bytearray(encode_png(img))
    df = spark.createDataFrame(
        [(1, png), (2, bytearray(b"unparseable-bytes"))],
        "id long, content binary",
    ).repartition(1)
    got = {r["id"]: r for r in extract_image_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (5, 6, 3)
    assert got[1]["mean_intensity"] == 200.0
    # undecodable payload still produces the deterministic fake row
    assert got[2]["width"] % 16 == 0


def test_resize_images_real_png_path(spark):
    from data_integration_pipelines_spark.operators.multimodal import (
        resize_images,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4] = 255  # top half white: nearest 2x2 thumb = rows [255,0]
    png = bytearray(encode_png(img))
    df = spark.createDataFrame([(1, png)], "id long, content binary").repartition(1)
    row = resize_images(df, target=(2, 2)).collect()[0]
    import hashlib

    want = resize_nearest(img, (2, 2)).tobytes()
    assert row["thumb_md5"] == hashlib.md5(want).hexdigest()


def test_png_fuzz_raises_only_value_error():
    """decode-or-ValueError for arbitrary bytes behind the PNG
    signature (the executor-safety contract shared with jpeg_lite):
    no raw zlib.error / struct.error, no hostile-IHDR allocation."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=2000)
    @given(st.binary(min_size=0, max_size=200))
    def run(body):
        try:
            decode_png(b"\x89PNG\r\n\x1a\n" + body)
        except ValueError:
            pass

    run()
    # hostile IHDR claiming 65535x65535 must raise, not allocate
    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="64 Mpx"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)
