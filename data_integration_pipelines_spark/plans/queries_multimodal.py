"""Multimodal-column queries: opaque binary payloads with typed
metadata, plus mapInPandas decode / resize / frame-sample stages.

Fixtures carry no real media, so each query first SYNTHESIZES a
deterministic binary payload per document (md5-hex of the text,
repeated a per-doc number of times, unhexed — ``synth_asset``), then
runs the operator under test on the bytes. The payload construction is
reproducible in any engine with md5/repeat/unhex, which is what makes
even the Python-kernel stages exactly oracle-checkable: the fake
decode kernels hash the hex REPRESENTATION of the bytes (see
operators/multimodal.py), so DuckDB can recompute every output value.

Extends the reference's attachment handling (download file -> per-file
Python kernel -> metric rows; ref src/helpers.py:181-225,
src/trace/thumbnail.py:25-62) to multimodal training-data curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.quantize import e4_sql
from ..operators.cache import presented
from ..operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_frames,
    synth_asset,
)
from .base import register

_HEXD = "0123456789abcdef"


def _assets(spark: SparkSession, sf_dir: str, limit_ids: int) -> DataFrame:
    """(id, content) binary-asset table derived from documents: payload
    = unhex(repeat(md5(text), 1 + doc_id % 7))."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < limit_ids)
    copies = (F.col("doc_id") % 7 + 1).cast("int")
    return docs.select(
        F.col("doc_id").alias("id"), synth_asset(F.col("text"), copies).alias("content")
    )


# Shared oracle CTE: the same asset table in hex-string domain
# (hexstr == lower(hex(content))).
_ASSET_CTE = """
    WITH assets AS (
        SELECT doc_id AS id,
               repeat(md5(text), CAST(1 + doc_id % 7 AS INT)) AS hexstr
        FROM documents WHERE doc_id < {limit}
    )
"""


@register(
    "multimodal_meta",
    _ASSET_CTE.format(limit=500)
    + f"""
    SELECT id,
           CAST(octet_length(unhex(hexstr)) AS INT) AS content_size,
           md5(hexstr) AS content_md5,
           CAST(16 * strpos('{_HEXD}', substr(hexstr, 1, 1)) AS INT) AS width,
           CAST(16 * strpos('{_HEXD}', substr(hexstr, 2, 1)) AS INT) AS height
    FROM assets
    ORDER BY id
    """,
    doc="Typed metadata parsed JVM-side from an opaque binary column "
    "(size, digest-of-hex, header-derived dims) — no Python, no decode; "
    "the cheap-probe-before-decode pattern of ref src/trace/thumbnail.py:25-46.",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir, 500)
    hexstr = F.lower(F.hex(F.col("content")))
    return assets.select(
        "id",
        F.length("content").cast("int").alias("content_size"),
        F.md5(hexstr).alias("content_md5"),
        (F.lit(16) * F.instr(F.lit(_HEXD), F.substring(hexstr, 1, 1)))
        .cast("int")
        .alias("width"),
        (F.lit(16) * F.instr(F.lit(_HEXD), F.substring(hexstr, 2, 1)))
        .cast("int")
        .alias("height"),
    ).orderBy("id")


@register(
    "frame_sample",
    _ASSET_CTE.format(limit=200)
    + """
    SELECT id,
           CAST(k AS INT) AS frame_idx,
           md5(substr(hexstr, CAST(k * 8 + 1 AS INT), 8)) AS frame_md5
    FROM assets,
         LATERAL (
            SELECT unnest(range(least(8, octet_length(unhex(hexstr)) // 4))) AS k
         )
    ORDER BY id, frame_idx
    """,
    doc="Video frame-sampling stage: UDTF-shaped mapInPandas fan-out (one "
    "row per sampled 4-byte 'frame', capped at 8) with an exact SQL oracle "
    "— the batch shape a real keyframe sampler (av) would produce.",
)
def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir, 200)
    # presented(): the decode kernel is shuffle-free — a bare orderBy
    # would run it twice (range-partition sampling); same below
    return presented(
        sample_frames(assets, every_n_bytes=4, max_frames=8),
        "id",
        "frame_idx",
    )


@register(
    "image_resize",
    _ASSET_CTE.format(limit=200)
    + """
    SELECT id,
           CAST(32 AS INT) AS width,
           CAST(32 AS INT) AS height,
           md5(hexstr || ':32x32') AS thumb_md5
    FROM assets
    ORDER BY id
    """,
    doc="Image resize stage (mapInPandas; deterministic fake thumbnail "
    "digest when PIL is absent — schema/batching identical to the real "
    "path).",
)
def image_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir, 200)
    # deterministic=True: the oracle recomputes the FAKE digest, so the
    # hash must not depend on whether the container has PIL
    return presented(
        resize_images(assets, target=(32, 32), deterministic=True), "id"
    )


@register(
    "audio_features",
    _ASSET_CTE.format(limit=200)
    + f"""
    , d AS (
        SELECT id, hexstr,
               CASE WHEN substr(hexstr, 1, 8) = '52494646'
                         AND substr(hexstr, 17, 8) = '57415645' THEN 'wav'
                    WHEN substr(hexstr, 1, 8) = '664c6143' THEN 'flac'
                    WHEN substr(hexstr, 1, 8) = '4f676753' THEN 'ogg'
                    WHEN substr(hexstr, 1, 6) = '494433' THEN 'mp3'
                    ELSE 'unknown' END AS fmt
        FROM assets
    )
    SELECT id,
           CASE WHEN fmt = 'unknown' THEN CAST(16000 AS INT) END AS sample_rate,
           CASE WHEN fmt = 'unknown'
                THEN CAST(octet_length(unhex(hexstr)) AS INT) END AS n_samples,
           CASE WHEN fmt = 'unknown' THEN
               ROUND(sqrt(list_avg(list_transform(
                   range(1, octet_length(unhex(hexstr)) + 1),
                   i -> pow(16 * (strpos('{_HEXD}', substr(hexstr, 2*i - 1, 1)) - 1)
                            + (strpos('{_HEXD}', substr(hexstr, 2*i, 1)) - 1), 2)
               ))), 4) END AS rms,
           FALSE AS decoded,
           fmt AS format
    FROM d
    ORDER BY id
    """,
    doc="Audio feature extraction (mapInPandas): payload bytes as u8 "
    "samples -> RMS; real path gated on soundfile. Honest-failure "
    "contract mirrors the image side: a recognized audio container "
    "(wav/flac/ogg/mp3 magic) that cannot be decoded yields "
    "decoded=false with NULL rate/samples/rms — never faked sample "
    "counts. The oracle mirrors the magic-prefix table so payloads "
    "that randomly carry a container magic grade against the honest "
    "contract after any fixture regeneration.",
)
def audio_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir, 200)
    return presented(extract_audio_features(assets, deterministic=True), "id")


@register(
    "wav_native_audio",
    f"""
    WITH s AS (
        SELECT doc_id AS id,
               CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate,
               list_transform(range(0, 64),
                   k -> (doc_id * 131 + k * 997) % 65536 - 32768) AS samples
        FROM documents WHERE doc_id < 150
    )
    SELECT id,
           rate AS sample_rate,
           CAST(64 AS INT) AS n_samples,
           {e4_sql('SQRT(list_sum(list_transform(samples, x -> CAST(x*x AS DOUBLE)))'
                   ' / (64 * 32768.0 * 32768.0))')} AS rms_e4,
           TRUE AS decoded,
           'wav' AS format
    FROM s
    ORDER BY id
    """,
    doc="REAL audio decode, fully oracle-certified: per-doc int16 PCM "
    "sample trains encode to genuine RIFF/WAVE bytes (operators/"
    "wav_lite) and decode back through extract_audio_features' native "
    "WAV path — PCM is lossless, so the oracle recomputes rate, frame "
    "count and RMS from the ORIGINAL samples. RMS is an exact int64 "
    "sum of squares -> one divide -> one sqrt (identical IEEE sequence "
    "in the kernel and the SQL), emitted as e4 basis points. The "
    "dependency-free audio floor next to jpeg_native_decode; container "
    "edge cases (extra chunks, padding, stereo, truncation, non-PCM "
    "rejection) are pinned in tests/test_multimodal.py, soundfile "
    "cross-parity under @realdeps.",
)
def wav_native_audio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..functions.quantize import e4

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    seeds = docs.select(
        F.col("doc_id").alias("id"),
        (8000 + (F.col("doc_id") % 3) * 4000).cast("int").alias("rate"),
    )

    def encode(batches):
        import numpy as np

        from ..operators.wav_lite import encode_wav

        for pdf in batches:
            out_id, out_wav = [], []
            for i, rt in zip(pdf["id"], pdf["rate"]):
                k = np.arange(64, dtype=np.int64)
                s = ((int(i) * 131 + k * 997) % 65536 - 32768).astype(np.int16)
                out_id.append(int(i))
                out_wav.append(bytearray(encode_wav(s, int(rt))))
            yield pd.DataFrame({"id": out_id, "content": out_wav})

    encoded = seeds.mapInPandas(encode, schema="id bigint, content binary")
    feats = extract_audio_features(encoded)
    return presented(
        feats.select(
            "id",
            "sample_rate",
            "n_samples",
            e4(F.col("rms")).alias("rms_e4"),
            "decoded",
            "format",
        ),
        "id",
    )


@register(
    "flac_native_audio",
    f"""
    WITH s AS (
        SELECT doc_id AS id,
               CAST(8000 + (doc_id % 4) * 8000 AS INT) AS rate,
               list_transform(range(0, 96),
                   k -> (doc_id * 257 + k * k * 31) % 65536 - 32768) AS samples
        FROM documents WHERE doc_id < 150
    )
    SELECT id,
           rate AS sample_rate,
           CAST(96 AS INT) AS n_samples,
           {e4_sql('SQRT(list_sum(list_transform(samples, x -> CAST(x*x AS DOUBLE)))'
                   ' / (96 * 32768.0 * 32768.0))')} AS rms_e4,
           TRUE AS decoded,
           'flac' AS format
    FROM s
    ORDER BY id
    """,
    doc="REAL FLAC decode, fully oracle-certified (the wav_native_audio "
    "pattern lifted to a COMPRESSED lossless codec): per-doc int16 "
    "sample trains encode to spec-conforming FLAC bytes (operators/"
    "flac_lite — fixed-predictor + Rice frames, CRC-8/16, STREAMINFO "
    "MD5) and decode back through extract_audio_features' native FLAC "
    "path. Losslessness means the oracle recomputes rate, frame count "
    "and exact-int64 RMS from the ORIGINAL samples — the decoder's "
    "prediction/Rice/CRC machinery must reproduce every input bit to "
    "hash-match. Quadratic phase in the train defeats the order-1/2 "
    "predictors on some blocks, so frames mix FIXED and VERBATIM "
    "subframes. LPC/mid-side/rice2/partitioned-residual decode paths "
    "(which this encoder never emits) are pinned by hand-assembled "
    "spec frames in tests/test_multimodal.py; soundfile cross-parity "
    "under @realdeps.",
)
def flac_native_audio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..functions.quantize import e4

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    seeds = docs.select(
        F.col("doc_id").alias("id"),
        (8000 + (F.col("doc_id") % 4) * 8000).cast("int").alias("rate"),
    )

    def encode(batches):
        import numpy as np

        from ..operators.flac_lite import encode_flac

        for pdf in batches:
            out_id, out_flac = [], []
            for i, rt in zip(pdf["id"], pdf["rate"]):
                k = np.arange(96, dtype=np.int64)
                s = ((int(i) * 257 + k * k * 31) % 65536 - 32768).astype(np.int16)
                out_id.append(int(i))
                out_flac.append(bytearray(encode_flac(s, int(rt), block_size=32)))
            yield pd.DataFrame({"id": out_id, "content": out_flac})

    encoded = seeds.mapInPandas(encode, schema="id bigint, content binary")
    feats = extract_audio_features(encoded)
    return presented(
        feats.select(
            "id",
            "sample_rate",
            "n_samples",
            e4(F.col("rms")).alias("rms_e4"),
            "decoded",
            "format",
        ),
        "id",
    )


@register(
    "image_decode_features",
    _ASSET_CTE.format(limit=200)
    + f"""
    , d AS (
        SELECT id, hexstr, md5(hexstr) AS dh,
               octet_length(unhex(hexstr)) AS clen,
               CASE WHEN substr(hexstr, 1, 16) = '89504e470d0a1a0a' THEN 'png'
                    WHEN substr(hexstr, 1, 6) = 'ffd8ff' THEN 'jpeg'
                    WHEN substr(hexstr, 1, 8) = '47494638' THEN 'gif'
                    WHEN substr(hexstr, 1, 8) IN ('49492a00', '4d4d002a') THEN 'tiff'
                    WHEN substr(hexstr, 1, 8) = '52494646'
                         AND substr(hexstr, 17, 8) = '57454250' THEN 'webp'
                    ELSE 'unknown' END AS fmt
        FROM assets
    ),
    dims AS (
        SELECT id, hexstr, clen, fmt,
               16 * (1 + CAST(('0x' || substr(dh, 1, 2)) AS INT) % 15) AS width,
               16 * (1 + CAST(('0x' || substr(dh, 3, 2)) AS INT) % 15) AS height,
               1 + CAST(('0x' || substr(dh, 5, 2)) AS INT) % 3 AS n_channels
        FROM d
    ),
    sized AS (
        SELECT *, LEAST(width * height * n_channels, 4096) AS need
        FROM dims
    )
    SELECT id,
           CASE WHEN fmt = 'unknown' THEN CAST(width AS INT) END AS width,
           CASE WHEN fmt = 'unknown' THEN CAST(height AS INT) END AS height,
           CASE WHEN fmt = 'unknown' THEN CAST(n_channels AS INT) END AS n_channels,
           CASE WHEN fmt = 'unknown' THEN
               FLOOR(list_avg(list_transform(
                   range(0, need),
                   i -> 16 * (strpos('{_HEXD}', substr(hexstr, 2 * (i % clen) + 1, 1)) - 1)
                        + (strpos('{_HEXD}', substr(hexstr, 2 * (i % clen) + 2, 1)) - 1)
               )) * 10000 + 0.5) / 10000.0 END AS mean_intensity,
           CASE WHEN fmt = 'unknown' THEN
               md5(substr(repeat(hexstr, CAST(need / clen AS INT) + 1), 1, 2 * need))
           ELSE md5(hexstr) END AS feature_crc,
           FALSE AS decoded,
           fmt AS format
    FROM sized
    ORDER BY id
    """,
    doc="Image decode + feature extraction via mapInPandas (native PNG "
    "codec / PIL for real images; the deterministic fake for opaque "
    "payloads — these assets are md5-tiled bytes, so the fake path runs "
    "and every output is re-derived by the oracle: digest-derived dims, "
    "tiled-buffer mean intensity, hex-domain crc). Full hash oracle "
    "since round 3 (was rows-only). The oracle mirrors the magic-prefix "
    "table, so a payload that randomly starts with a container magic "
    "(p = 2^-24 for JPEG per doc) grades against the honest-failure "
    "contract instead of hash-mismatching after a fixture regeneration.",
)
def image_decode_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir, 200)
    return presented(extract_image_features(assets, crc_domain="hex"), "id")


@register(
    "png_decode_features",
    f"""
    WITH px AS (
        SELECT doc_id AS id,
               repeat(md5(text), 3 * (1 + CAST(doc_id % 3 AS INT))) AS hexstr
        FROM documents WHERE doc_id < 200
    )
    SELECT id,
           CAST(4 AS INT) AS width,
           CAST(octet_length(unhex(hexstr)) / 12 AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           FLOOR(list_avg(list_transform(
               range(1, octet_length(unhex(hexstr)) + 1),
               i -> 16 * (strpos('{_HEXD}', substr(hexstr, 2*i - 1, 1)) - 1)
                    + (strpos('{_HEXD}', substr(hexstr, 2*i, 1)) - 1)
           )) * 10000 + 0.5) / 10000.0 AS mean_intensity,
           md5(hexstr) AS feature_crc,
           TRUE AS decoded,
           'png' AS format
    FROM px
    ORDER BY id
    """,
    doc="REAL image decode, fully oracle-certified: per-doc pixels are "
    "synthesized from the md5-hex domain, encoded to genuine PNG bytes "
    "(operators/png_lite — scanline filter id%5, so all five filters run "
    "in production), then decoded back by extract_image_features' native "
    "PNG path. The oracle recomputes dims/mean/crc from the ORIGINAL "
    "pixels, so any lossy codec bug (filter math, zlib framing, "
    "reshape) hash-mismatches. Extends src/trace/thumbnail.py:25-62 "
    "(download -> PIL decode -> stats) with a dependency-free codec.",
)
def png_decode_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pix = docs.select(
        F.col("doc_id").alias("id"),
        F.unhex(
            F.repeat(F.md5("text"), (3 * (1 + F.col("doc_id") % 3)).cast("int"))
        ).alias("content"),
    )

    def encode(batches):
        import numpy as np

        from ..operators.png_lite import encode_png

        for pdf in batches:
            out_id, out_png = [], []
            for i, c in zip(pdf["id"], pdf["content"]):
                buf = np.frombuffer(bytes(c), dtype=np.uint8)
                img = buf.reshape(-1, 4, 3)  # (h, w=4, c=3)
                out_id.append(int(i))
                out_png.append(bytearray(encode_png(img, filter_type=int(i) % 5)))
            yield pd.DataFrame({"id": out_id, "content": out_png})

    encoded = pix.mapInPandas(encode, schema="id bigint, content binary")
    from ..operators.multimodal import extract_image_features

    return presented(extract_image_features(encoded, crc_domain="hex"), "id")


@register(
    "jpeg_decode_features",
    """
    WITH assets AS (
        SELECT doc_id AS id,
               'ffd8ffe0' || repeat(md5(text), CAST(1 + doc_id % 5 AS INT))
                   AS hexstr
        FROM documents WHERE doc_id < 200
    )
    SELECT id,
           CAST(NULL AS INT) AS width,
           CAST(NULL AS INT) AS height,
           CAST(NULL AS INT) AS n_channels,
           CAST(NULL AS DOUBLE) AS mean_intensity,
           md5(hexstr) AS feature_crc,
           FALSE AS decoded,
           'jpeg' AS format
    FROM assets
    ORDER BY id
    """,
    doc="Honest-failure contract for decodable formats (extends src/"
    "trace/thumbnail.py:25-62 PIL decode): payloads carry a real JPEG "
    "SOI/APP0 magic but undecodable bodies, so the decode stage must "
    "emit decoded=false with NULL geometry and the raw-payload digest "
    "— never digest-faked dims, which would poison any downstream "
    "filter keyed on width/height. Deterministic with or without PIL "
    "(PIL also rejects the garbage body); the @realdeps test covers "
    "the PIL success path on a real JPEG. format='jpeg' comes from "
    "magic sniffing JVM-free in the same mapInPandas pass.",
)
def jpeg_decode_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    assets = docs.select(
        F.col("doc_id").alias("id"),
        F.unhex(
            F.concat(
                F.lit("ffd8ffe0"),
                F.repeat(F.md5("text"), (1 + F.col("doc_id") % 5).cast("int")),
            )
        ).alias("content"),
    )
    return presented(extract_image_features(assets, crc_domain="hex"), "id")


@register(
    "jpeg_native_decode",
    f"""
    WITH g AS (
        SELECT doc_id AS id, CAST((doc_id * 7 + 13) % 256 AS BIGINT) AS gray
        FROM documents WHERE doc_id < 150
    ),
    chain AS (
        -- the encoder/decoder DC chain for a solid block, closed form:
        -- level*8 exact integer FDCT DC -> half-away quantize by
        -- Q[0,0]=16 (Annex K at quality 50) -> dequantize -> integer
        -- IDCT of a DC-only block = floor((dc+4)/8) -> +128, clamp
        SELECT id, gray,
               CAST(SIGN((gray - 128) / 2.0)
                    * FLOOR(ABS((gray - 128) / 2.0) + 0.5) AS BIGINT) AS qdc
        FROM g
    ),
    v AS (
        SELECT id,
               LEAST(255, GREATEST(0,
                   CAST(FLOOR((qdc * 16 + 4) / 8.0) AS BIGINT) + 128)) AS px
        FROM chain
    )
    SELECT id,
           CAST(16 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(1 AS INT) AS n_channels,
           CAST(px * 10000 AS BIGINT) AS mean_intensity_e4,
           md5(repeat(lpad(lower(to_hex(px)), 2, '0'), 128)) AS feature_crc,
           TRUE AS decoded,
           'jpeg' AS format
    FROM v
    ORDER BY id
    """,
    doc="REAL baseline-JPEG decode, fully oracle-certified: per-doc "
    "solid-gray 16x8 images encode to genuine JFIF bytes "
    "(operators/jpeg_lite — Annex-K tables, typical Huffman tables, "
    "integer FDCT) and decode back through extract_image_features' "
    "native JPEG path. A solid block survives the lossy pipeline in "
    "CLOSED FORM (every AC coefficient is exactly 0; the integer IDCT "
    "of a DC-only block is floor((dc+4)/8)+128), so the oracle derives "
    "the decoded pixel value, the e4 mean and the pixel-hex digest "
    "from doc_id alone — any drift in marker parsing, Huffman tables, "
    "quantization or the IDCT descale hash-mismatches. The "
    "dependency-free JPEG floor for a 100 TB image corpus; gradient / "
    "color / 4:2:0 / restart-marker coverage is pinned in "
    "tests/test_jpeg_lite.py, PIL cross-parity under @realdeps.",
)
def jpeg_native_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..functions.quantize import e4
    from ..operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    grays = docs.select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") * 7 + 13) % 256).cast("int").alias("gray"),
    )

    def encode(batches):
        import numpy as np

        from ..operators.jpeg_lite import encode_jpeg

        for pdf in batches:
            out_id, out_jpg = [], []
            for i, gv in zip(pdf["id"], pdf["gray"]):
                img = np.full((8, 16), int(gv), dtype=np.uint8)
                out_id.append(int(i))
                out_jpg.append(bytearray(encode_jpeg(img, quality=50)))
            yield pd.DataFrame({"id": out_id, "content": out_jpg})

    encoded = grays.mapInPandas(encode, schema="id bigint, content binary")
    feats = extract_image_features(encoded, crc_domain="hex")
    return presented(
        feats.select(
            "id",
            "width",
            "height",
            "n_channels",
            e4(F.col("mean_intensity")).alias("mean_intensity_e4"),
            "feature_crc",
            "decoded",
            "format",
        ),
        "id",
    )
