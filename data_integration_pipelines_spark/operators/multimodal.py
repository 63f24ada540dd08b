"""Multimodal column operators: image / audio / video as opaque
``binary`` columns with typed metadata, plus decode / feature-extract /
resize / frame-sample stages as Arrow-batched ``mapInPandas`` kernels.

This is the training-data-pipeline extension of the reference's
scientific-file handling (SWC/NWB/NRRD attachments driven through
per-file Python kernels — ref src/helpers.py:181-225,
src/trace/thumbnail.py:25-62): the file payload rides through the
DataFrame as bytes; metadata extraction stays JVM-side; only the
irreducible decode work drops to Python, batched via Arrow.

Decode cores, in preference order: the NATIVE PNG codec
(``png_lite`` — stdlib+numpy, works everywhere), then PIL/soundfile/av
where importable (other formats), then a clearly-marked deterministic
fake that derives same-shaped output purely from the payload's hex
digest (genuinely undecodable payloads only — and every fake output is
SQL-derivable, so even that path carries a full DuckDB oracle). The
Spark-side contract — input/output schema, partitioning, Arrow batch
shape, UDF signature — is identical in all modes.

Scale notes:
- Payload bytes dominate row width -> keep multimodal columns OUT of
  shuffles: extract features first (project early), join features back
  by id instead of shuffling blobs.
- ``spread`` (see dedup.py) before decode so per-file CPU work uses
  every core even when the scan has few partitions.
- Arrow batch memory = batch_rows x payload size; cap with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` for big assets.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import spread

IMAGE_FEATURES_SCHEMA = (
    "id bigint, width int, height int, n_channels int, "
    "mean_intensity double, feature_crc string, "
    "decoded boolean, format string"
)

RESIZED_SCHEMA = "id bigint, width int, height int, thumb_md5 string"

FRAME_SCHEMA = "id bigint, frame_idx int, frame_md5 string"

AUDIO_FEATURES_SCHEMA = (
    "id bigint, sample_rate int, n_samples int, rms double, "
    "decoded boolean, format string"
)


def synth_asset(payload_seed: Column, copies: Column) -> Column:
    """Deterministic opaque binary payload: md5(seed) hex repeated
    ``copies`` times, unhexed. Stands in for real image/audio/video
    bytes in fixtures — 16*copies bytes, fully reproducible in any
    engine with md5/repeat/unhex."""
    return F.unhex(F.repeat(F.md5(payload_seed), copies))


def _hex_header(content: Column, nchars: int = 4) -> Column:
    return F.lower(F.hex(F.substring(content, 1, (nchars + 1) // 2)))


def image_header_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata for an image-bytes column, parsed JVM-side from the
    'header' bytes (no Python): size, digest, and header-derived
    dimensions. Mirrors the reference's thumbnail probe, which reads
    only cheap per-file facts before deciding to decode
    (ref src/trace/thumbnail.py:25-46)."""
    hdr = _hex_header(F.col(content_col), 4)
    hex_digits = "0123456789abcdef"
    return df.withColumns(
        {
            "content_size": F.length(F.col(content_col)).cast("int"),
            "content_md5": F.md5(F.col(content_col)),
            # header nibble k (1-based instr into the hex alphabet, 0 if
            # absent) -> small deterministic dims; the POINT is typed
            # metadata parsed from leading bytes without decoding.
            "width": (F.lit(16) * F.instr(F.lit(hex_digits), F.substring(hdr, 1, 1))).cast("int"),
            "height": (F.lit(16) * F.instr(F.lit(hex_digits), F.substring(hdr, 2, 1))).cast("int"),
        }
    )


def _hexdigest_of_hex(data: bytes, suffix: str = "") -> str:
    """md5 over the lowercase-hex REPRESENTATION of ``data`` (+suffix).
    The fake kernels hash the hex string, not the raw bytes, so every
    output is reproducible in SQL engines whose md5 only accepts
    strings (a real codec path would hash raw bytes instead)."""
    return hashlib.md5((data.hex() + suffix).encode()).hexdigest()


def _fake_decode(content: bytes) -> tuple[int, int, int, bytes]:
    """Deterministic fake image decode: (width, height, channels,
    pixel_bytes) derived only from the payload digest + length. The
    digest is taken over the lowercase-HEX representation (the fake-
    kernel convention of this module), which makes every output —
    dims, tiled pixel buffer, mean, hex-domain crc — SQL-derivable, so
    ``image_decode_features`` carries a full DuckDB oracle."""
    d = hashlib.md5(content.hex().encode()).digest()
    width = 16 * (1 + d[0] % 15)
    height = 16 * (1 + d[1] % 15)
    channels = 1 + d[2] % 3
    # fake pixel buffer: payload tiled to the decoded size, capped small
    need = min(width * height * channels, 4096)
    reps = need // max(len(content), 1) + 1
    return width, height, channels, (content * reps)[:need]


_IMAGE_MAGIC: tuple[tuple[bytes, str], ...] = (
    # >=3-byte magics only. BMP's 2-byte 'BM' is deliberately NOT
    # sniffed: 1/65536 of random binary starts with it, so an opaque
    # payload would occasionally be misclassified as a decodable
    # container and flip from the (oracle-modeled) fake path to the
    # honest-failure path. The oracles mirror this exact prefix table.
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
)


def detect_image_format(content: bytes) -> str:
    """Container format by magic bytes ('png'/'jpeg'/'gif'/'webp'/
    'tiff', else 'unknown')."""
    for magic, fmt in _IMAGE_MAGIC:
        if content[: len(magic)] == magic:
            return fmt
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        return "webp"
    return "unknown"


def _pil_decode(content: bytes) -> tuple[int, int, int, bytes]:
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(content))
    width, height = img.size
    return width, height, len(img.getbands()), img.tobytes()


def _decode_any(content: bytes) -> tuple:
    """(width, height, channels, pixel bytes, decoded, format).

    Decode order: the native PNG codec for PNG bytes and the native
    baseline-JPEG codec for JPEG bytes (``png_lite`` / ``jpeg_lite`` —
    deterministic everywhere, no dependency), then PIL for the other
    recognized image containers (GIF/BMP/WEBP/TIFF, plus non-baseline
    JPEG profiles) when importable. A recognized
    container that cannot be decoded (no PIL, or corrupt) yields an
    HONEST failure row — ``decoded=False`` with null geometry and the
    raw payload as the feature source — never a digest fake: faking
    dims for a real-but-unreadable image would poison any downstream
    filter keyed on them. Only unrecognized payloads (the synthetic
    fixtures) take the deterministic fake, flagged ``decoded=False``
    with ``format='unknown'``."""
    fmt = detect_image_format(content)
    if fmt == "png":
        try:
            from .png_lite import decode_png

            arr = decode_png(content)
            h, w, ch = arr.shape
            return w, h, ch, arr.tobytes(), True, fmt
        except Exception:
            pass  # malformed PNG -> try PIL, then honest failure
    if fmt == "jpeg":
        try:
            from .jpeg_lite import decode_jpeg

            arr = decode_jpeg(content)
            h, w, ch = arr.shape
            return w, h, ch, arr.tobytes(), True, fmt
        except Exception:
            pass  # non-baseline/corrupt JPEG -> try PIL, then honest failure
    if fmt != "unknown":
        try:
            width, height, ch, pix = _pil_decode(content)
            return width, height, ch, pix, True, fmt
        except Exception:
            return None, None, None, content, False, fmt
    width, height, channels, pix = _fake_decode(content)
    return width, height, channels, pix, False, fmt


def extract_image_features(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    crc_domain: str = "bytes",
) -> DataFrame:
    """Decode + feature-extract: (id, width, height, n_channels,
    mean_intensity, feature_crc) via ``mapInPandas``. PNG decodes
    natively (``png_lite``) everywhere; PIL handles other formats when
    present; undecodable payloads fall to the deterministic fake.

    ``crc_domain='hex'`` hashes the lowercase-hex representation of the
    pixel buffer instead of the raw bytes — SQL-recomputable, which is
    what lets ``png_decode_features`` carry a full DuckDB oracle.
    ``mean_intensity`` quantizes half-up in exact arithmetic
    (floor(mean*1e4+0.5)/1e4) so both engines round the same double the
    same way."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                c = bytes(c)
                width, height, channels, pix, decoded, fmt = _decode_any(c)
                if width is None:
                    # honest failure: geometry unknown, features keyed
                    # to the raw payload digest
                    mean_q = None
                else:
                    mean = sum(pix) / len(pix) if pix else 0.0
                    mean_q = math.floor(mean * 1e4 + 0.5) / 1e4
                crc_src = pix.hex().encode() if crc_domain == "hex" else pix
                rows.append(
                    {
                        "id": int(i),
                        "width": width,
                        "height": height,
                        "n_channels": channels,
                        "mean_intensity": mean_q,
                        "feature_crc": hashlib.md5(crc_src).hexdigest(),
                        "decoded": decoded,
                        "format": fmt,
                    }
                )
            out = pd.DataFrame(rows, columns=[
                "id", "width", "height", "n_channels", "mean_intensity",
                "feature_crc", "decoded", "format",
            ])
            # nullable Int32: honest-failure rows carry null geometry,
            # and a plain int column silently becomes float64 (NaN)
            # which Arrow refuses to cast back to int
            for geo in ("width", "height", "n_channels"):
                out[geo] = out[geo].astype("Int32")
            yield out

    return (
        spread(df.select(F.col(id_col).alias(id_col), content_col))
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (32, 32),
    id_col: str = "id",
    content_col: str = "content",
    deterministic: bool = False,
) -> DataFrame:
    """Resize stage: (id, width, height, thumb_md5).

    PNG and baseline-JPEG payloads decode + nearest-neighbor resize
    natively (``png_lite`` / ``jpeg_lite`` — deterministic across
    environments, no dependency);
    other formats go through PIL when importable; bytes nothing can
    decode — and every row when ``deterministic=True`` — fall back to
    the fake digest (payload hex + target box), which is what the SQL
    oracle recomputes. Oracle-checked callers pass
    ``deterministic=True`` so their hashes never depend on payload
    decodability."""
    tw, th = target
    if deterministic:
        have_pil = False
    else:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                c = bytes(c)
                thumb = None
                if not deterministic and c[:8] == b"\x89PNG\r\n\x1a\n":
                    try:
                        from .png_lite import decode_png, resize_nearest

                        small = resize_nearest(decode_png(c), (tw, th))
                        thumb = hashlib.md5(small.tobytes()).hexdigest()
                    except Exception:
                        thumb = None
                if thumb is None and not deterministic and c[:3] == b"\xff\xd8\xff":
                    try:
                        from .jpeg_lite import decode_jpeg
                        from .png_lite import resize_nearest

                        small = resize_nearest(decode_jpeg(c), (tw, th))
                        thumb = hashlib.md5(small.tobytes()).hexdigest()
                    except Exception:
                        thumb = None
                if thumb is None and have_pil:
                    from PIL import Image

                    try:
                        img = Image.open(io.BytesIO(c)).convert("RGB")
                        img = img.resize((tw, th))
                        thumb = hashlib.md5(img.tobytes()).hexdigest()
                    except Exception:
                        thumb = None
                if thumb is None:
                    thumb = _hexdigest_of_hex(c, f":{tw}x{th}")
                rows.append({"id": int(i), "width": tw, "height": th, "thumb_md5": thumb})
            yield pd.DataFrame(rows, columns=["id", "width", "height", "thumb_md5"])

    return (
        spread(df.select(F.col(id_col).alias(id_col), content_col))
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 4,
    max_frames: int = 8,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame-sampling stage (UDTF-shaped: one row per sampled
    frame). The fake treats each ``every_n_bytes`` window of the payload
    as a 'frame'; a real codec (av) would seek keyframes the same way —
    the fan-out shape and schema are identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                c = bytes(c)
                n = min(max_frames, max(len(c) // every_n_bytes, 0))
                for k in range(n):
                    frame = c[k * every_n_bytes : (k + 1) * every_n_bytes]
                    rows.append(
                        {
                            "id": int(i),
                            "frame_idx": k,
                            "frame_md5": _hexdigest_of_hex(frame),
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_md5"])

    return (
        spread(df.select(F.col(id_col).alias(id_col), content_col))
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


_AUDIO_MAGIC: tuple[tuple[bytes, str], ...] = (
    # >=3-byte magics only; the 2-byte MPEG frame sync (0xFF 0xEx) is
    # deliberately NOT sniffed — ~1/2048 of random binary matches it,
    # the same weak-magic trap as BMP's 'BM' on the image side.
    (b"fLaC", "flac"),
    (b"OggS", "ogg"),
    (b"ID3", "mp3"),
)


def detect_audio_format(content: bytes) -> str:
    """Audio container by magic ('wav'/'flac'/'ogg'/'mp3', else
    'unknown')."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    for magic, fmt in _AUDIO_MAGIC:
        if content[: len(magic)] == magic:
            return fmt
    return "unknown"


def extract_audio_features(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    deterministic: bool = False,
) -> DataFrame:
    """Audio decode: (id, sample_rate, n_samples, rms, decoded, format).

    Decode order mirrors the image side: 16-bit PCM WAV parses NATIVELY
    (``wav_lite`` — a chunk walk, no codec, works everywhere; RMS over
    the first channel from an exact int64 sum of squares, one divide,
    one sqrt — no float summation order), FLAC decodes NATIVELY
    (``flac_lite`` — constant/verbatim/fixed/LPC subframes, Rice
    residuals, stereo decorrelation, CRC-verified; lossless, so the
    same exact-int64 RMS applies), then soundfile where importable
    (remaining formats / exotic bit depths). A payload carrying a
    RECOGNIZED audio magic that cannot be decoded (no soundfile,
    corrupt body, or ``deterministic=True``) yields an honest failure
    — ``decoded=False`` with null rate/samples/rms — never the byte
    fake: fake sample counts for a real-but-unreadable recording would
    poison any duration/quality filter keyed on them. Only unrecognized
    payloads (the synthetic fixtures) take the deterministic
    u8-at-16kHz fake, flagged ``decoded=False`` with
    ``format='unknown'`` — which the SQL oracle recomputes."""
    if deterministic:
        have_sf = False
    else:
        try:
            import soundfile  # noqa: F401

            have_sf = True
        except ImportError:
            have_sf = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                c = bytes(c)
                fmt = detect_audio_format(c)
                result = None
                if fmt == "wav" and not deterministic:
                    import math

                    import numpy as np

                    from .wav_lite import decode_wav

                    try:
                        rate, samples = decode_wav(c)
                        first = samples[:, 0]
                        nf = int(first.shape[0])
                        # soundfile's int16 convention (x / 32768), but
                        # through an EXACT integer sum of squares
                        sumsq = int(np.sum(first.astype(np.int64) ** 2))
                        rms = (
                            math.sqrt(sumsq / (nf * 32768.0 * 32768.0))
                            if nf
                            else 0.0
                        )
                        result = (int(rate), nf, rms, True)
                    except Exception:
                        result = None  # -> soundfile, then honest failure
                if fmt == "flac" and result is None and not deterministic:
                    import math

                    import numpy as np

                    from .flac_lite import decode_flac, stream_info

                    try:
                        scale = float(1 << (stream_info(c)["bits_per_sample"] - 1))
                        rate, samples = decode_flac(c)
                        first = samples[:, 0]
                        nf = int(first.shape[0])
                        # same exact-int64 RMS convention as the WAV
                        # path (normalized by 2^(bps-1), soundfile's
                        # convention); FLAC is lossless so the samples
                        # are bit-equal to the encoder's input and the
                        # oracle recomputes this from the source train
                        sumsq = int(np.sum(first.astype(np.int64) ** 2))
                        rms = (
                            math.sqrt(sumsq / (nf * scale * scale))
                            if nf
                            else 0.0
                        )
                        result = (int(rate), nf, rms, True)
                    except Exception:
                        result = None  # -> soundfile, then honest failure
                if result is None and have_sf:
                    import soundfile as sf

                    try:
                        data, rate = sf.read(io.BytesIO(c))
                        if data.ndim > 1:
                            data = data[:, 0]
                        n = int(data.shape[0])
                        rms = float((data.astype("float64") ** 2).mean() ** 0.5) if n else 0.0
                        result = (int(rate), n, round(rms, 4), True)
                    except Exception:
                        result = None
                if result is None:
                    if fmt != "unknown":
                        # honest failure for a real-but-unreadable container
                        result = (None, None, None, False)
                    else:
                        if c:
                            mean_sq = sum(b * b for b in c) / len(c)
                            rms = mean_sq ** 0.5
                        else:
                            rms = 0.0
                        result = (16000, len(c), round(rms, 4), False)
                rate, n, rms, ok = result
                rows.append(
                    {
                        "id": int(i),
                        "sample_rate": rate,
                        "n_samples": n,
                        "rms": rms,
                        "decoded": ok,
                        "format": fmt,
                    }
                )
            out = pd.DataFrame(rows, columns=[
                "id", "sample_rate", "n_samples", "rms", "decoded", "format",
            ])
            for c_ in ("sample_rate", "n_samples"):
                out[c_] = out[c_].astype("Int32")
            yield out

    return (
        spread(df.select(F.col(id_col).alias(id_col), content_col))
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )
