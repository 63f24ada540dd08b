"""Native baseline-JPEG codec (stdlib + numpy, zero dependencies) —
the JPEG sibling of ``png_lite``, giving ``_decode_any`` a real decode
floor for the format that dominates a 100 TB image corpus instead of an
honest-failure row whenever PIL is absent.

Scope (the baseline-sequential profile, ITU-T T.81):

- **decode**: SOI/APPn/COM/DQT (8-bit)/SOF0/DHT/DRI/SOS/RSTn/EOI;
  1-component grayscale and 3-component YCbCr with any sampling
  factors whose maxima divide 4 (covers 4:4:4, 4:2:2, 4:2:0);
  byte-stuffing (0xFF00) and restart-interval handling.
- **encode**: baseline sequential, Annex-K quantization tables scaled
  by the libjpeg quality convention, the spec's "typical" Huffman
  tables (Annex K.3), grayscale or 4:4:4 / 4:2:0 YCbCr.

Determinism (the property every oracle in this repo is built on): the
decoder's inverse DCT is **pure integer arithmetic** — a precomputed
64x64 basis of ``round(alpha_u*alpha_v/4 * cos*cos * 2^20)`` int64
entries, accumulated with numpy integer matmul (no BLAS dispatch, no
FMA, no summation-order variance) and descaled with one arithmetic
shift (exact floor). Identical bytes decode to identical pixels on
every platform, so decoded-pixel digests can sit in differential
oracles. For a DC-only block the chain collapses to the closed form

    pixel = clamp(floor((dc*Q + 4) / 8) + 128, 0, 255)

(``dc*Q`` = dequantized DC; ``*2^17 + 2^19 >> 2^20`` = ``+4 >> 3``),
which is what lets a solid-color JPEG carry a full SQL oracle — see
plans/queries_multimodal.jpeg_native_decode. The chroma upsample is
sample replication and the color transform uses libjpeg's 16-bit
fixed-point constants — integer end to end.

The encoder's forward DCT is float64 (encode happens once, at fixture
build; solid blocks are exact: every AC coefficient is identically 0.0
and DC = 8*(level) with no rounding). PIL parity in both directions is
pinned by ``@realdeps`` tests where PIL exists.

Ref parity: extends the reference's thumbnail decode probe
(src/trace/thumbnail.py:25-62) the way png_lite does — the reference
shells out to PIL; this repo carries a no-dependency floor.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: Annex K.1/K.2 quantization tables (natural row-major order)
K1_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
K2_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

#: zig-zag order: ZIGZAG[i] = natural index of the i-th zig-zag element
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: integer IDCT basis: IB[u*8+v, x*8+y] =
#: round(a(u)a(v)/4 * cos((2x+1)u*pi/16) * cos((2y+1)v*pi/16) * 2^20).
#: int64 matmul against it is deterministic (numpy's integer loops —
#: BLAS only dispatches floats), descale is one arithmetic shift.
_IDCT_SHIFT = 20


def _idct_basis() -> np.ndarray:
    # alpha(u) = 1/sqrt(2) for u=0 else 1; overall factor 1/4
    alpha = np.ones(8)
    alpha[0] = 1.0 / np.sqrt(2.0)
    x = np.arange(8)
    cos = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)  # [u, x]
    b = np.einsum("ux,vy->uvxy", alpha[:, None] * cos, alpha[:, None] * cos) / 4.0
    return np.round(b.reshape(64, 64) * (1 << _IDCT_SHIFT)).astype(np.int64)


_IB = _idct_basis()

_YCC_ONE = 1 << 16  # 16-bit fixed-point color constants (libjpeg jdcolor)
_FIX_1_402 = 91881
_FIX_0_344 = 22554
_FIX_0_714 = 46802
_FIX_1_772 = 116130


class JpegError(ValueError):
    """Malformed / unsupported JPEG payload."""


# ---------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any non-RST marker."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.bitcnt <= 24:
            if self.marker is not None:
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.bitcnt += 8
                continue
            if self.pos >= len(d):
                raise JpegError("entropy data truncated")
            byte = d[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(d):
                    raise JpegError("entropy data truncated at 0xFF")
                nxt = d[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    # a real marker: stop consuming, pad with zeros
                    self.marker = nxt
                    self.pos += 1
                    self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                    self.bitcnt += 8
                    continue
            self.bitbuf = ((self.bitbuf << 8) | byte) & 0xFFFFFFFF
            self.bitcnt += 8

    def get_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bitcnt < n:
            self._fill()
        v = (self.bitbuf >> (self.bitcnt - n)) & ((1 << n) - 1)
        self.bitcnt -= n
        return v

    def reset(self) -> None:
        """Restart-marker resync: drop buffered bits, consume RSTn."""
        self.bitbuf = 0
        self.bitcnt = 0
        d = self.data
        if self.marker is not None:
            m = self.marker
            self.marker = None
            if 0xD0 <= m <= 0xD7:
                return
            raise JpegError(f"expected RST marker, got 0x{m:02x}")
        # markers may also sit directly in the stream
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise JpegError("missing restart marker")


def _build_huff(bits: list[int], vals: list[int]):
    """(max_len, lookup dict {(length, code): value}) per T.81 C.2."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _huff_decode(br: _BitReader, lut) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.get_bits(1)
        v = lut.get((length, code))
        if v is not None:
            return v
    raise JpegError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


#: decode-side allocation guard: a corrupt/hostile SOF claiming
#: 65535x65535 must raise, not allocate gigabytes in an executor
MAX_DECODE_PIXELS = 1 << 26  # 64 Mpx ~ 192 MB RGB


def decode_jpeg(data: bytes, max_pixels: int = MAX_DECODE_PIXELS) -> np.ndarray:
    """Decode a baseline-sequential JPEG to uint8 pixels with shape
    (H, W, 1) for grayscale or (H, W, 3) RGB. Deterministic: integer
    IDCT + integer color transform (module docstring). Raises
    :class:`JpegError` on anything outside the baseline profile, on
    frames claiming more than ``max_pixels`` (allocation guard), and
    on ANY malformed stream — the executor-safety contract is
    decode-or-JpegError, never a foreign exception, enforced by
    explicit segment validation plus a conversion net (a decode
    kernel over untrusted corpus bytes must be total)."""
    try:
        return _decode_jpeg(data, max_pixels)
    except JpegError:
        raise
    except (IndexError, ValueError, KeyError, OverflowError, struct.error) as e:
        raise JpegError(f"malformed JPEG stream: {type(e).__name__}: {e}") from e


def _decode_jpeg(data: bytes, max_pixels: int) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, components) with (cid, hs, vs, tq)
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise JpegError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            raise JpegError("truncated segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise JpegError("truncated segment body")
        body_end = pos + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                if len(tbl) != 64:
                    raise JpegError("short DQT")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl.astype(np.int64)
                qt[tq] = nat
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise JpegError("short SOF0 segment")
            prec = seg[0]
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            if h == 0 or w == 0:
                raise JpegError("zero frame dimension")
            if h * w > max_pixels:
                raise JpegError(f"frame {w}x{h} exceeds max_pixels={max_pixels}")
            nc = seg[5]
            if nc not in (1, 3):
                raise JpegError(f"{nc}-component images unsupported")
            if len(seg) < 6 + 3 * nc:
                raise JpegError("short SOF0 component list")
            comps = []
            for ci in range(nc):
                cid, hv, tq_ = seg[6 + 3 * ci : 9 + 3 * ci]
                hs_, vs_ = hv >> 4, hv & 0x0F
                if not (1 <= hs_ <= 4 and 1 <= vs_ <= 4):
                    raise JpegError(f"sampling factors {hs_}x{vs_} out of range")
                comps.append((cid, hs_, vs_, tq_))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(f"non-baseline SOF 0x{marker:02x} unsupported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                if len(bits) != 16:
                    raise JpegError("short DHT bits table")
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if len(vals) != nv:
                    raise JpegError("short DHT value table")
                lut = _build_huff(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = lut
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise JpegError("short DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF0")
            if len(seg) < 1:
                raise JpegError("empty SOS segment")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns:
                raise JpegError("short SOS component list")
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                data, body_end, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # else: APPn/COM — skip
        pos = body_end
    raise JpegError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    if len(scan) != len(comps):
        raise JpegError("scan/frame component mismatch")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    by_id = {c[0]: c for c in comps}
    planes = []
    meta = []  # (hs, vs, qtab, dc_lut, ac_lut)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise JpegError(f"scan references unknown component {cs}")
        _, hs, vs, tq_ = by_id[cs]
        if tq_ not in qt:
            raise JpegError(f"missing quant table {tq_}")
        if td not in huff_dc or ta not in huff_ac:
            raise JpegError("missing Huffman table")
        planes.append(
            np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.uint8)
        )
        meta.append((hs, vs, qt[tq_], huff_dc[td], huff_ac[ta]))

    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.reset()
                pred = [0] * len(scan)
            for ci, (hs, vs, qtab, dlut, alut) in enumerate(meta):
                for byi in range(vs):
                    for bxi in range(hs):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(br, dlut)
                        if t > 11:
                            raise JpegError("bad DC category")
                        diff = _extend(br.get_bits(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        kk = 1
                        while kk < 64:
                            rs = _huff_decode(br, alut)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    kk += 16  # ZRL
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise JpegError("AC run overflow")
                            coef[ZIGZAG[kk]] = _extend(br.get_bits(s), s)
                            kk += 1
                        # dequantize + integer IDCT + level shift
                        dq = coef * qtab
                        px = (dq @ _IB + (1 << (_IDCT_SHIFT - 1))) >> _IDCT_SHIFT
                        px = np.clip(px + 128, 0, 255).astype(np.uint8)
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px.reshape(8, 8)
            mcu_count += 1

    # upsample (sample replication) + crop to the frame size
    full = []
    for ci, (hs, vs, *_rest) in enumerate(meta):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            if hmax % hs or vmax % vs:
                raise JpegError("non-integer sampling ratio")
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        return full[0][:, :, None]
    y = full[0].astype(np.int64)
    cb = full[1].astype(np.int64) - 128
    cr = full[2].astype(np.int64) - 128
    half = _YCC_ONE >> 1
    r = y + ((_FIX_1_402 * cr + half) >> 16)
    g = y - ((_FIX_0_344 * cb + _FIX_0_714 * cr + half) >> 16)
    b = y + ((_FIX_1_772 * cb + half) >> 16)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


def quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex-K table: q=50 is the table
    verbatim; clamped to [1, 255] (baseline 8-bit)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


class _BitWriter:
    __slots__ = ("out", "buf", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.cnt += length
        while self.cnt >= 8:
            byte = (self.buf >> (self.cnt - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.cnt -= 8
        self.buf &= (1 << self.cnt) - 1

    def flush(self) -> None:
        if self.cnt:
            pad = 8 - self.cnt
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _enc_huff(bits: list[int], vals: list[int]):
    """value -> (code, length) map (encoder view of _build_huff)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return enc


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _fdct_quant(block: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Integer FDCT + half-away quantization — the forward transform
    through the SAME scaled-integer basis as the decoder's IDCT (the
    orthonormal basis is its own inverse-transpose), so encoding is
    bit-deterministic across platforms and a constant block's DC is
    EXACTLY ``8 * level`` (the basis column sums to 2^23 by
    construction), which is what the solid-color SQL oracle derives."""
    s = np.rint(block).astype(np.int64).reshape(64) - 128
    f = (s @ _IB.T + (1 << (_IDCT_SHIFT - 1))) >> _IDCT_SHIFT
    q = f.astype(np.float64) / qtab
    return (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)


def _encode_block(bw, coef, pred, dc_enc, ac_enc) -> int:
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_enc[t]
    bw.put(code, length)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]
            bw.put(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_enc[(run << 4) | s]
        bw.put(c, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_enc[0x00]
        bw.put(c, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels — (H, W) / (H, W, 1) grayscale or (H, W, 3)
    RGB — as a baseline-sequential JFIF JPEG (Annex-K tables scaled by
    ``quality``, typical Huffman tables, optional 4:2:2 / 4:2:0 chroma
    subsampling; ``restart_interval`` > 0 emits DRI + RSTn every N
    MCUs)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("pixels must be (H,W)[,1] gray or (H,W,3) RGB")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4', '4:2:2' or '4:2:0'")

    qluma = quality_scaled(K1_LUMA, quality)
    qchroma = quality_scaled(K2_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, tbl in ((0, qluma),) + (() if gray else ((1, qchroma),)):
        zz = tbl[ZIGZAG]
        out += _seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))

    if gray:
        comps = [(1, 1, 1, 0)]
    else:
        # luma sampling factors per mode: 4:4:4 -> 1x1, 4:2:2 -> 2x1
        # (horizontal-only chroma decimation), 4:2:0 -> 2x2
        hs0, vs0 = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[subsampling]
        comps = [(1, hs0, vs0, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return _seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    sos = bytes([len(comps)])
    for cid, *_r in comps:
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # color transform + plane extraction (float64 BT.601, encode-only)
    if gray:
        planes = [px.astype(np.float64)]
        metas = [(comps[0][1], comps[0][2], qluma, _enc_huff(DC_LUMA_BITS, DC_LUMA_VALS), _enc_huff(AC_LUMA_BITS, AC_LUMA_VALS))]
    else:
        rf, gf, bf = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168735892 * rf - 0.331264108 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418687589 * gf - 0.081312411 * bf + 128.0
        planes = [y, cb, cr]
        le = (_enc_huff(DC_LUMA_BITS, DC_LUMA_VALS), _enc_huff(AC_LUMA_BITS, AC_LUMA_VALS))
        ce = (_enc_huff(DC_CHROMA_BITS, DC_CHROMA_VALS), _enc_huff(AC_CHROMA_BITS, AC_CHROMA_VALS))
        metas = [
            (comps[0][1], comps[0][2], qluma, *le),
            (1, 1, qchroma, *ce),
            (1, 1, qchroma, *ce),
        ]

    hmax = max(m[0] for m in metas)
    vmax = max(m[1] for m in metas)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # pad each plane to its sampled MCU grid (edge replication), with
    # chroma downsampled by 2x2 box mean where subsampled
    grids = []
    for ci, (hs, vs, qtab, dce, ace) in enumerate(metas):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            fy, fx = vmax // vs, hmax // hs
            ph = ((h + fy - 1) // fy) * fy
            pw = ((w + fx - 1) // fx) * fx
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        grids.append(p)

    bw = _BitWriter()
    pred = [0] * len(metas)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)]
                )
                pred = [0] * len(metas)
            mcu_count += 1
            for ci, (hs, vs, qtab, dce, ace) in enumerate(metas):
                for byi in range(vs):
                    for bxi in range(hs):
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        block = grids[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _fdct_quant(block, qtab)
                        pred[ci] = _encode_block(bw, coef, pred[ci], dce, ace)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
