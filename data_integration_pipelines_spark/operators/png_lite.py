"""Dependency-free PNG codec (stdlib ``zlib`` + ``struct`` + numpy).

PNG's pixel path is zlib + five per-scanline difference filters —
nothing that needs libpng — so the multimodal image stages decode for
real everywhere instead of gating on PIL (the same "native floor"
pattern as ``hdf5_lite``/``xlsx_lite``/the NRRD parser). PIL remains
the preferred branch when importable (it covers JPEG/GIF/WebP; this
module is PNG-only).

Decoder: 8-bit gray / gray+alpha / RGB / RGBA / palette, all five
scanline filters (None, Sub, Up, Average, Paeth), multi-IDAT,
non-interlaced (Adam7 rejected loudly). Encoder: 8-bit gray/RGB/RGBA
with a selectable filter type — encoding with each filter exercises
the decoder's unfilter logic independently in tests.

Spec: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> color type (encode)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit (H, W) or (H, W, C) uint8 -> PNG bytes. ``filter_type``
    applies one filter to every scanline (0 = None is the fast path;
    1-4 exist so tests can exercise each unfilter branch)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)

    stride = w * c
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        raw.append(filter_type)
        raw += _filter_row(row, prev, c, filter_type).tobytes()
        prev = row
    idat = zlib.compress(bytes(raw), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _filter_row(row: np.ndarray, prev: np.ndarray, bpp: int, ft: int) -> np.ndarray:
    r = row.astype(np.int16)
    a = np.zeros_like(r)
    a[bpp:] = r[:-bpp]
    b = prev.astype(np.int16)
    cc = np.zeros_like(b)
    cc[bpp:] = b[:-bpp]
    if ft == 0:
        return row
    if ft == 1:
        return ((r - a) % 256).astype(np.uint8)
    if ft == 2:
        return ((r - b) % 256).astype(np.uint8)
    if ft == 3:
        return ((r - (a + b) // 2) % 256).astype(np.uint8)
    return ((r - _paeth(a, b, cc)) % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (palette expanded to RGB)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("malformed IHDR chunk")
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            palette = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (8 only)")
    if interlace:
        raise ValueError("Adam7 interlacing not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    c = _CHANNELS[color_type]
    # frame allocation guard + total-decode contract shared with
    # jpeg_lite: a hostile IHDR must not allocate gigabytes, and a
    # corrupt stream must raise ValueError, never a raw zlib.error
    if width == 0 or height == 0:
        raise ValueError("zero frame dimension")
    if width * height > (1 << 26):
        raise ValueError(f"frame {width}x{height} exceeds 64 Mpx guard")
    stride = width * c
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated pixel data")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int16)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            # left-dependent filters recur along x: process per pixel
            # group (vector over channels, loop over width)
            rec = np.zeros(stride, dtype=np.int16)
            for x in range(width):
                s = slice(x * c, (x + 1) * c)
                a = rec[(x - 1) * c : x * c] if x else np.zeros(c, dtype=np.int16)
                b = prev[s]
                cc = (
                    prev[(x - 1) * c : x * c] if x else np.zeros(c, dtype=np.int16)
                )
                if ft == 1:
                    rec[s] = (line[s] + a) % 256
                elif ft == 3:
                    rec[s] = (line[s] + (a + b) // 2) % 256
                else:
                    rec[s] = (line[s] + _paeth(a, b, cc)) % 256
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    pixels = out.reshape(height, width, c)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        pixels = pal[pixels[:, :, 0]]
    return pixels


def resize_nearest(pixels: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) -> (th, tw, C): pure index
    gather, the deterministic baseline every image pipeline needs
    before interpolating variants."""
    tw, th = target
    h, w = pixels.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return pixels[ys][:, xs]
