"""Native baseline-JPEG codec (operators/jpeg_lite): DC-only closed
form (the SQL-oracle contract), lossy-roundtrip quality bounds, 4:2:0 /
restart-marker / byte-stuffing coverage, honest failure on garbage and
non-baseline profiles, determinism, the multimodal decode-chain wiring,
and PIL cross-parity under @realdeps."""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_integration_pipelines_spark.operators.jpeg_lite import (
    K1_LUMA,
    JpegError,
    decode_jpeg,
    encode_jpeg,
    quality_scaled,
)


def _closed_form_solid(gray: int, quality: int = 50) -> int:
    """The oracle's DC chain: exact FDCT DC = 8*level, half-away
    quantize by Q[0,0], dequantize, integer IDCT floor((dc+4)/8)+128."""
    q = int(quality_scaled(K1_LUMA, quality)[0])
    x = (gray - 128) * 8.0 / q
    qdc = int(math.copysign(math.floor(abs(x) + 0.5), x)) if x else 0
    return min(255, max(0, ((qdc * q + 4) >> 3) + 128))


def test_solid_gray_closed_form_every_level():
    # the jpeg_native_decode oracle depends on this EXACT chain for
    # every gray level — a drift anywhere in encode or decode breaks it
    for g in range(256):
        out = decode_jpeg(encode_jpeg(np.full((8, 16), g, np.uint8), quality=50))
        assert out.shape == (8, 16, 1)
        vals = np.unique(out)
        assert len(vals) == 1 and vals[0] == _closed_form_solid(g), g


def test_gray_gradient_roundtrip_quality():
    img = (np.add.outer(np.arange(24) * 3, np.arange(40) * 2) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 2


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_color_roundtrip_and_odd_dims(sub):
    rng = np.random.RandomState(3)
    smooth = np.zeros((16, 16, 3), np.uint8)
    smooth[:, :, 0] = (np.add.outer(np.arange(16) * 4, np.arange(16) * 4) % 256).astype(
        np.uint8
    )
    smooth[:, :, 1] = 100
    smooth[:, :, 2] = 50
    dec = decode_jpeg(encode_jpeg(smooth, quality=95, subsampling=sub))
    assert dec.shape == (16, 16, 3)
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 8
    # non-multiple-of-MCU dims crop correctly
    odd = rng.randint(0, 256, (17, 23, 3)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(odd, quality=90, subsampling=sub)).shape == odd.shape


def test_restart_markers_bit_equal():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (40, 56)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=92))
    for ri in (1, 2, 5):
        data = encode_jpeg(img, quality=92, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        np.testing.assert_array_equal(decode_jpeg(data), base)


def test_byte_stuffing_roundtrip():
    # images whose entropy stream emits 0xFF bytes must round-trip;
    # high-contrast noise at low quality reliably produces them
    rng = np.random.RandomState(7)
    for seed in range(4):
        img = (rng.randint(0, 2, (16, 16)) * 255).astype(np.uint8)
        data = encode_jpeg(img, quality=25)
        dec = decode_jpeg(data)
        assert dec.shape == (16, 16, 1)


def test_encode_decode_deterministic():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    a = encode_jpeg(img, 80, "4:2:0")
    assert a == encode_jpeg(img, 80, "4:2:0")
    np.testing.assert_array_equal(decode_jpeg(a), decode_jpeg(a))


def test_garbage_and_truncation_raise():
    with pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + bytes(30))  # garbage body
    good = encode_jpeg(np.full((8, 8), 77, np.uint8))
    with pytest.raises(JpegError):
        decode_jpeg(good[: len(good) // 2])  # truncated entropy data


def test_progressive_profile_rejected_honestly():
    # SOF2 (progressive) must raise, not mis-decode: build a header
    # that switches the SOF marker byte
    good = encode_jpeg(np.full((8, 8), 10, np.uint8))
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(JpegError, match="non-baseline"):
        decode_jpeg(prog)


def test_decode_chain_prefers_native_jpeg():
    from data_integration_pipelines_spark.operators.multimodal import _decode_any

    img = np.full((8, 16), 200, np.uint8)
    w, h, ch, pix, decoded, fmt = _decode_any(encode_jpeg(img, quality=50))
    assert (w, h, ch, decoded, fmt) == (16, 8, 1, True, "jpeg")
    assert set(pix) == {_closed_form_solid(200)}
    # garbage with JPEG magic still fails honestly (no fake dims)
    w2, h2, ch2, _, decoded2, fmt2 = _decode_any(b"\xff\xd8\xff\xe0" + bytes(20))
    assert (w2, h2, ch2, decoded2, fmt2) == (None, None, None, False, "jpeg")


@pytest.mark.realdeps
def test_pil_decodes_our_encodes():
    import io

    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    data = encode_jpeg(img, quality=90)
    pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    ours = decode_jpeg(data)
    # two conformant decoders of the same stream agree within the
    # spec's IDCT tolerance
    assert np.abs(pil.astype(int) - ours.astype(int)).max() <= 2


@pytest.mark.realdeps
def test_we_decode_pil_encodes():
    import io

    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", quality=90)
    data = buf.getvalue()
    ours = decode_jpeg(data)
    pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == pil.shape
    assert np.abs(pil.astype(int) - ours.astype(int)).max() <= 2


def test_allocation_guard_and_sampling_validation():
    import struct

    good = encode_jpeg(np.full((8, 8), 50, np.uint8))
    i = good.index(b"\xff\xc0") + 5  # SOF0 h,w offset
    huge = good[:i] + struct.pack(">HH", 65535, 65535) + good[i + 4 :]
    with pytest.raises(JpegError, match="max_pixels"):
        decode_jpeg(huge)
    zero = good[:i] + struct.pack(">HH", 0, 8) + good[i + 4 :]
    with pytest.raises(JpegError, match="zero frame"):
        decode_jpeg(zero)
    # hv byte sits 6 past the height offset (h2 w2 nc1 cid1 -> hv)
    bad_sampling = good[: i + 6] + bytes([0x05]) + good[i + 7 :]
    with pytest.raises(JpegError, match="sampling factors"):
        decode_jpeg(bad_sampling)


def test_fuzz_never_hangs_or_crashes():
    """Arbitrary bytes behind a SOI marker must either decode or raise
    JpegError — never hang, never surface a foreign exception (the
    executor-safety contract of a decode kernel over untrusted data)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=2000)
    @given(st.binary(min_size=0, max_size=300))
    def run(body):
        try:
            out = decode_jpeg(b"\xff\xd8" + body)
            assert out.dtype == np.uint8
        except JpegError:
            pass

    run()


def test_fuzz_truncations_of_valid_stream():
    """Every prefix of a real JPEG must decode (if complete) or raise
    JpegError — truncation anywhere in marker or entropy space."""
    rng = np.random.RandomState(23)
    data = encode_jpeg(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8), 70)
    for cut in range(0, len(data), 7):
        try:
            decode_jpeg(data[:cut])
        except JpegError:
            pass


def test_malformed_segments_raise_jpeg_error_not_foreign():
    """Malformed-but-plausible headers must raise JpegError, never a
    foreign IndexError/ValueError/struct.error (the executor-safety
    contract; each case targets one segment validator)."""
    cases = [
        b"\xff\xd8\xff\xc0\x00\x02",  # SOF0 with empty body
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x08\x00\x08",  # short SOF header
        # SOF declaring 3 components but a short component list
        b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x03\x01\x11\x00",
        b"\xff\xd8\xff\xc4\x00\x05\x00\xff\xff",  # DHT bits overflow
        b"\xff\xd8\xff\xdd\x00\x03\x01",  # short DRI
        b"\xff\xd8\xff\xda\x00\x03\x02",  # short SOS
    ]
    for c in cases:
        with pytest.raises(JpegError):
            decode_jpeg(c)
