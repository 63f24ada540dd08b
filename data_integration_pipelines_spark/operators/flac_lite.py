"""Native FLAC decoder/encoder (stdlib + numpy) — the lossless-audio
sibling of ``wav_lite`` and ``jpeg_lite``, implementing the public FLAC
format (RFC 9639 / the xiph.org spec).

FLAC is lossless, so — like PCM WAV and unlike JPEG — a native floor
buys FULL oracle certification: the decoded samples are bit-equal to
the originals, and an SQL oracle can recompute every downstream feature
(rate, frame count, RMS) from the source sample train.

Decoder scope (the real bitstream, not a toy):

- CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (any order) subframes
  — the four subframe types real encoders emit;
- Rice-coded residuals, both 4-bit (method 0) and 5-bit (method 1)
  parameters, any partition order, escape partitions;
- wasted-bits tracking;
- independent, left/side, right/side and mid/side channel assignments;
- all block-size / sample-rate / sample-size header codings, UTF-8
  coded frame numbers, fixed and variable blocking;
- CRC-8 (frame header) and CRC-16 (whole frame) VERIFIED, STREAMINFO
  MD5 verified when signed — corruption raises, never mis-decodes.

Anything outside (bps > 32, reserved codes, malformed streams) raises
:class:`FlacError` so callers fall through to soundfile or an honest
``decoded=false`` — the png_lite/wav_lite contract.

Encoder scope (enough to write real, spec-conforming files): 16-bit
PCM, independent channels, fixed blocking; per block and channel it
picks the cheapest of CONSTANT / FIXED(0-4)+Rice / VERBATIM — so
encoded streams exercise the decoder's prediction and Rice paths, not
just the verbatim one. Compression on real signals comes from the
fixed predictors, same as ``flac --fast``.

Ref parity: extends the reference's per-file attachment kernels
(src/helpers.py:181-225) the way png_lite extends its thumbnail probe.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    """Malformed / unsupported FLAC payload."""


# --------------------------------------------------------------------------
# CRCs (FLAC frame integrity): CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both MSB-first, init 0.
# --------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# --------------------------------------------------------------------------
# Bit I/O
# --------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "byte_pos", "bit_buf", "bit_cnt")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.byte_pos = byte_pos
        self.bit_buf = 0
        self.bit_cnt = 0

    def bit_position(self) -> int:
        return self.byte_pos * 8 - self.bit_cnt

    def read(self, n: int) -> int:
        while self.bit_cnt < n:
            if self.byte_pos >= len(self.data):
                raise FlacError("truncated stream")
            self.bit_buf = (self.bit_buf << 8) | self.data[self.byte_pos]
            self.byte_pos += 1
            self.bit_cnt += 8
        self.bit_cnt -= n
        val = (self.bit_buf >> self.bit_cnt) & ((1 << n) - 1)
        self.bit_buf &= (1 << self.bit_cnt) - 1
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and (v >> (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.bit_cnt == 0:
                if self.byte_pos >= len(self.data):
                    raise FlacError("truncated stream (unary)")
                self.bit_buf = self.data[self.byte_pos]
                self.byte_pos += 1
                self.bit_cnt = 8
            if self.bit_buf == 0:
                q += self.bit_cnt
                self.bit_cnt = 0
                continue
            top = self.bit_buf.bit_length()
            q += self.bit_cnt - top
            self.bit_cnt = top - 1
            self.bit_buf &= (1 << self.bit_cnt) - 1
            return q

    def align(self) -> None:
        rem = self.bit_cnt % 8
        if rem:
            self.read(rem)


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def getvalue(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise FlacError("bad UTF-8 coded number")
    val = first & (mask - 1)
    for _ in range(n_extra):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise FlacError("bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise FlacError("block size not divisible by partition count")
    part_samples = block_size >> part_order
    if part_samples <= order and n_parts == 1:
        raise FlacError("partition too small for predictor order")
    res: list[int] = []
    for p in range(n_parts):
        count = part_samples - (order if p == 0 else 0)
        if count < 0:
            raise FlacError("partition too small for predictor order")
        param = r.read(plen)
        if param == escape:
            raw_bits = r.read(5)
            if raw_bits:
                res.extend(r.read_signed(raw_bits) for _ in range(count))
            else:
                res.extend([0] * count)
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                res.append((u >> 1) ^ -(u & 1))
    return res


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise FlacError("subframe header padding bit set")
    sftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise FlacError("wasted bits exceed sample size")

    if sftype == 0:  # CONSTANT
        v = r.read_signed(ebps)
        out = [v] * block_size
    elif sftype == 1:  # VERBATIM
        out = [r.read_signed(ebps) for _ in range(block_size)]
    elif 8 <= sftype <= 12:  # FIXED order 0..4
        order = sftype - 8
        if order > block_size:
            raise FlacError("predictor order exceeds block size")
        out = [r.read_signed(ebps) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        coeffs = _FIXED_COEFFS[order]
        for i, e in enumerate(res):
            pos = order + i
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * out[pos - 1 - j]
            out.append(e + pred)
    elif sftype >= 32:  # LPC
        order = (sftype & 31) + 1
        if order > block_size:
            raise FlacError("LPC order exceeds block size")
        out = [r.read_signed(ebps) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise FlacError("invalid LPC coefficient precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coeffs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        for i, e in enumerate(res):
            pos = order + i
            acc = 0
            for j, c in enumerate(coeffs):
                acc += c * out[pos - 1 - j]
            out.append(e + (acc >> shift))
    else:
        raise FlacError(f"reserved subframe type {sftype:06b}")

    if wasted:
        out = [v << wasted for v in out]
    return out


_BLOCK_SIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                     8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                     13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) < 34:
        raise FlacError("short STREAMINFO")
    min_bs, max_bs = struct.unpack(">HH", body[:4])
    packed = int.from_bytes(body[10:18], "big")
    rate = packed >> 44
    n_ch = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    return {
        "min_block_size": min_bs,
        "max_block_size": max_bs,
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits_per_sample": bps,
        "total_samples": total,
        "md5": body[18:34],
    }


def stream_info(data: bytes) -> dict:
    """Parse just the fLaC marker + STREAMINFO block (cheap metadata
    probe — the FLAC analogue of a WAV fmt-chunk read)."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise FlacError("truncated metadata block")
        if btype == 0:
            return _parse_streaminfo(body)
        if btype == 127:
            raise FlacError("invalid metadata block type 127")
        pos += 4 + size
        if hdr & 0x80:
            break
    raise FlacError("missing STREAMINFO")


def decode_flac(data: bytes, verify_md5: bool = True) -> tuple[int, np.ndarray]:
    """Parse FLAC bytes -> (sample_rate, int32 samples with shape
    (n_frames, n_channels)). Lossless: bit-equal to the encoder's
    input. Raises :class:`FlacError` on anything malformed or outside
    the documented scope."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise FlacError("truncated metadata block")
        if btype == 0:
            info = _parse_streaminfo(body)
        elif btype == 127:
            raise FlacError("invalid metadata block type 127")
        pos += 4 + size
    if info is None:
        raise FlacError("missing STREAMINFO")
    n_ch = info["n_channels"]

    channels: list[list[int]] = [[] for _ in range(n_ch)]
    n_decoded = 0
    while pos < len(data):
        if len(data) - pos < 2:
            break  # trailing padding byte(s)
        frame_start = pos
        r = _BitReader(data, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise FlacError(f"bad frame sync at byte {pos}")
        if r.read(1):
            raise FlacError("reserved bit set in frame header")
        r.read(1)  # blocking strategy (number semantics only)
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise FlacError("reserved bit set in frame header")
        _decode_utf8_number(r)

        if bs_code == 0:
            raise FlacError("reserved block size code 0")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_CODES[bs_code]

        if rate_code == 0:
            rate = info["sample_rate"]
        elif rate_code == 12:
            rate = r.read(8) * 1000
        elif rate_code == 13:
            rate = r.read(16)
        elif rate_code == 14:
            rate = r.read(16) * 10
        elif rate_code == 15:
            raise FlacError("invalid sample rate code")
        else:
            rate = _RATE_CODES[rate_code]

        if bps_code == 0:
            bps = info["bits_per_sample"]
        elif bps_code == 3:
            raise FlacError("reserved sample size code")
        else:
            bps = _BPS_CODES[bps_code]

        crc8_pos = r.bit_position()
        if crc8_pos % 8:
            raise FlacError("frame header not byte-aligned")
        crc8_pos //= 8
        if crc8(data[frame_start:crc8_pos]) != r.read(8):
            raise FlacError("frame header CRC-8 mismatch")

        if ch_code <= 7:
            frame_ch = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            frame_ch = 2
            side = ch_code
        else:
            raise FlacError(f"reserved channel assignment {ch_code}")
        if frame_ch != n_ch:
            raise FlacError("frame channel count != STREAMINFO")

        subs = []
        for c in range(frame_ch):
            ch_bps = bps
            if (side == 8 and c == 1) or (side == 9 and c == 0) or (
                side == 10 and c == 1
            ):
                ch_bps += 1  # the side channel carries one extra bit
            subs.append(_decode_subframe(r, block_size, ch_bps))

        r.align()
        crc16_pos = r.bit_position() // 8
        if crc16(data[frame_start:crc16_pos]) != r.read(16):
            raise FlacError("frame CRC-16 mismatch")
        pos = r.byte_pos

        if side == 8:  # left/side: right = left - side
            left, s = subs
            subs = [left, [l - d for l, d in zip(left, s)]]
        elif side == 9:  # right/side: left = right + side
            s, right = subs
            subs = [[rr + d for rr, d in zip(right, s)], right]
        elif side == 10:  # mid/side
            mid, s = subs
            lefts, rights = [], []
            for m, d in zip(mid, s):
                m = (m << 1) | (d & 1)
                lefts.append((m + d) >> 1)
                rights.append((m - d) >> 1)
            subs = [lefts, rights]

        for c in range(n_ch):
            channels[c].extend(subs[c])
        n_decoded += block_size
        if info["total_samples"] and n_decoded >= info["total_samples"]:
            break

    total = info["total_samples"] or n_decoded
    if n_decoded < total:
        raise FlacError(
            f"stream ends after {n_decoded} of {total} samples"
        )
    out = np.array(
        [ch[:total] for ch in channels], dtype=np.int64
    ).T.copy()
    lo, hi = int(out.min(initial=0)), int(out.max(initial=0))
    if lo < -(2**31) or hi >= 2**31:
        raise FlacError("decoded samples exceed 32-bit range")
    out = out.astype(np.int32)

    if verify_md5 and info["md5"] != b"\x00" * 16:
        bps = info["bits_per_sample"]
        if bps % 8 == 0:
            width = bps // 8
            flat = out.reshape(-1)
            if width == 2:
                raw = flat.astype("<i2").tobytes()
            elif width == 1:
                raw = flat.astype("i1").tobytes()
            elif width == 3:
                b4 = flat.astype("<i4").tobytes()
                raw = b"".join(
                    b4[i : i + 3] for i in range(0, len(b4), 4)
                )
            else:
                raw = flat.astype("<i4").tobytes()
            if hashlib.md5(raw).digest() != info["md5"]:
                raise FlacError("STREAMINFO MD5 mismatch (corrupt stream)")
    return info["sample_rate"], out


# --------------------------------------------------------------------------
# Encoder (16-bit PCM, independent channels, fixed blocking)
# --------------------------------------------------------------------------


def _encode_utf8_number(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    # n-byte form carries 7 + 5*(n-1) bits (lead byte 7-n, 6 per tail)
    n_bytes = 2
    while val >= (1 << (n_bytes * 5 + 1)) and n_bytes < 7:
        n_bytes += 1
    lead_mask = (0xFF << (8 - n_bytes)) & 0xFF
    w.write(lead_mask | (val >> ((n_bytes - 1) * 6)), 8)
    for i in range(n_bytes - 2, -1, -1):
        w.write(0x80 | ((val >> (i * 6)) & 0x3F), 8)


def _best_rice_param(res: list[int]) -> tuple[int, int]:
    best_p, best_cost = 0, None
    for p in range(15):
        cost = 0
        for v in res:
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            cost += (u >> p) + 1 + p
            if best_cost is not None and cost >= best_cost:
                break
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p, best_cost


def _write_rice_residual(w: _BitWriter, res: list[int], param: int) -> None:
    w.write(0, 2)  # method 0: 4-bit params
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for v in res:
        u = (abs(v) << 1) - (1 if v < 0 else 0)
        w.write_unary(u >> param)
        w.write(u, param)


def _encode_subframe(w: _BitWriter, block: np.ndarray, bps: int) -> None:
    vals = [int(v) for v in block]
    n = len(vals)
    if all(v == vals[0] for v in vals):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(vals[0], bps)
        return
    # candidate FIXED orders: pick (order, rice param) minimizing bits.
    # Applying the difference operator `order` times leaves n - order
    # values — exactly the residuals for positions order..n-1; the
    # first `order` originals are the warmup samples.
    best = None  # (cost, order, warmup, residual, param)
    for order in range(0, 5):
        if order >= n:
            break
        residual = vals[:]
        for _ in range(order):
            residual = [
                residual[i] - residual[i - 1] for i in range(1, len(residual))
            ]
        param, cost = _best_rice_param(residual)
        total = order * bps + 2 + 4 + 4 + cost
        if best is None or total < best[0]:
            best = (total, order, vals[:order], residual, param)
    verbatim_cost = n * bps
    if best is not None and best[0] < verbatim_cost:
        _, order, warm, residual, param = best
        w.write(0, 1)
        w.write(8 + order, 6)  # FIXED
        w.write(0, 1)
        for v in warm:
            w.write(v, bps)
        _write_rice_residual(w, residual, param)
    else:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in vals:
            w.write(v, bps)


def encode_flac(
    samples: np.ndarray, sample_rate: int, block_size: int = 4096
) -> bytes:
    """int16 samples (n,) or (n_frames, n_channels) -> spec-conforming
    FLAC bytes (16-bit, independent channels, fixed blocking; each
    block/channel takes the cheapest of CONSTANT / FIXED+Rice /
    VERBATIM)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n,) or (n_frames, n_channels)")
    n_total, n_ch = s.shape
    if not 1 <= n_ch <= 8:
        raise ValueError(f"{n_ch} channels unsupported (1-8)")
    if not 16 <= block_size <= 65535:
        raise ValueError("block size must be in [16, 65535]")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("sample rate out of range")

    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | ((16 - 1) << 36) | n_total
    si += packed.to_bytes(8, "big")
    si += md5
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + si

    frame_no = 0
    for start in range(0, n_total, block_size):
        block = s[start : start + block_size]
        bs = block.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # block size: 16-bit value-1 at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(n_ch - 1, 4)  # independent channels
        w.write(4, 3)  # 16 bits per sample
        w.write(0, 1)
        _encode_utf8_number(w, frame_no)
        w.write(bs - 1, 16)
        w.align()
        header = w.getvalue()
        w2 = _BitWriter()
        for c in range(n_ch):
            _encode_subframe(w2, block[:, c], 16)
        w2.align()
        frame = header + bytes([crc8(header)]) + w2.getvalue()
        frame += struct.pack(">H", crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
