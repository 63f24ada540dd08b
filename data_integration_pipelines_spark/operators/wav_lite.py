"""Native RIFF/WAVE PCM parser (stdlib + numpy) — the audio sibling of
``png_lite``/``jpeg_lite``. PCM needs no codec at all, so a WAV decode
floor costs one chunk walk: with it, ``extract_audio_features`` reads
sample rate / sample count / RMS from real WAV payloads in a
no-dependency environment instead of emitting honest-failure rows.

Scope: canonical RIFF little-endian containers, ``fmt `` audio format 1
(integer PCM) at 16 bits/sample, any channel count, chunk walking that
tolerates extra chunks (LIST/fact/cue) and odd-length padding. Anything
else (float WAV, 8/24-bit, WAVE_FORMAT_EXTENSIBLE, compressed) raises
:class:`WavError` so the caller can fall through to soundfile or an
honest failure — a wrong-scale RMS is worse than a null one.

Determinism: the parse is byte-exact; downstream RMS uses an exact
int64 sum of squares followed by ONE divide and ONE sqrt (see
extract_audio_features), so identical bytes give identical doubles on
every platform — no float summation order anywhere.

Ref parity: extends the reference's per-file attachment kernels
(src/helpers.py:181-225) the way png_lite extends its thumbnail probe.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed / unsupported WAV payload."""


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF/WAVE 16-bit PCM bytes -> (sample_rate,
    int16 samples with shape (n_frames, n_channels))."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise WavError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise WavError("short fmt chunk")
            audio_format, n_ch, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1:
                raise WavError(f"non-PCM audio format {audio_format}")
            if bits != 16:
                raise WavError(f"{bits}-bit PCM unsupported (16-bit only)")
            if n_ch < 1:
                raise WavError("zero channels")
            fmt = (n_ch, rate)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if pcm is None:
        raise WavError("missing data chunk")
    n_ch, rate = fmt
    frame_bytes = 2 * n_ch
    usable = len(pcm) - (len(pcm) % frame_bytes)
    samples = np.frombuffer(pcm[:usable], dtype="<i2").reshape(-1, n_ch)
    return rate, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples (n,) or (n_frames, n_channels) -> canonical
    RIFF/WAVE 16-bit PCM bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n,) or (n_frames, n_channels)")
    n_ch = s.shape[1]
    pcm = s.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
