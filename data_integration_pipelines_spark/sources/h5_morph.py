"""H5 morphology source (S9c): the BBP/MorphIO HDF5 morphology layout
-> the engine's canonical per-point parent-pointer table
``(file, n, type, x, y, z, radius, parent)`` — the same shape the SWC
(``sources/swc.py``) and ASC (``sources/asc.py``) sources produce, so
every downstream kernel (``operators/morphology``) runs unchanged.

Layouts (both present in the reference's public test data
``data/test_data/h5/{v1,v2}``; ref src/neuron_morphology usage reads
them through morphio — here parsed natively via ``hdf5_lite``):

- **v1**: root datasets ``points`` (N x 4: x, y, z, diameter) and
  ``structure`` (S x 3: first point index, section type, parent
  section). Sections are contiguous point ranges.
- **v2**: one root group per cell: ``<cell>/raw/points``,
  ``<cell>/structure/raw`` (S x 2: first point, parent section),
  ``<cell>/structure/sectiontype``.

Per-point parent derivation (the tree-as-table convention): inside a
section each point's parent is the previous point; a section's first
point attaches to the LAST point of its parent section; root sections
attach to -1. radius = diameter / 2 (SWC convention).

Distribution: whole files flow as binary rows (``binaryFile`` scan or
an in-memory (file, content) frame) through an Arrow-batched
``mapInPandas`` — per-task memory bounded by file size, no driver
parsing, same scale shape as ``extract_sweeps``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

POINTS_SCHEMA = (
    "file string, n int, type int, x double, y double, z double, "
    "radius double, parent int"
)


def _sections(content: bytes) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parse one file -> list of (points Nx4, starts, types, parents)
    per cell (v1 files hold one cell; v2 files may hold several)."""
    from .hdf5_lite import Group, open_bytes

    f = open_bytes(content)
    cells = []
    if "points" in f and "structure" in f:
        pts = np.asarray(f["points"][()], dtype=np.float64)
        st = np.asarray(f["structure"][()], dtype=np.int64)
        cells.append((pts, st[:, 0], st[:, 1], st[:, 2]))
    else:
        for name in sorted(f.keys()):
            g = f[name]
            if not isinstance(g, Group) or "raw" not in g:
                continue
            pts = np.asarray(g["raw/points"][()], dtype=np.float64)
            raw = np.asarray(g["structure/raw"][()], dtype=np.int64)
            types = np.asarray(
                g["structure/sectiontype"][()], dtype=np.int64
            ).reshape(-1)
            cells.append((pts, raw[:, 0], types, raw[:, 1]))
    return cells


def _points_rows(file: str, content: bytes) -> pd.DataFrame:
    out = {k: [] for k in ("file", "n", "type", "x", "y", "z", "radius", "parent")}
    for pts, starts, types, parents in _sections(content):
        n_pts = len(pts)
        ends = np.append(starts[1:], n_pts)
        for s in range(len(starts)):
            for i in range(int(starts[s]), int(ends[s])):
                if i == int(starts[s]):
                    par = -1 if parents[s] < 0 else int(ends[int(parents[s])])
                else:
                    par = i  # previous point, 1-based
                out["file"].append(file)
                out["n"].append(i + 1)
                out["type"].append(int(types[s]))
                out["x"].append(float(pts[i, 0]))
                out["y"].append(float(pts[i, 1]))
                out["z"].append(float(pts[i, 2]))
                out["radius"].append(float(pts[i, 3]) / 2.0)
                out["parent"].append(par)
    return pd.DataFrame(out)


def parse_h5_frame(binary_df: DataFrame) -> DataFrame:
    """(file/path, content) frame -> points table. Column ``file`` or
    ``path`` names the morphology; ``content`` holds the HDF5 bytes."""
    name_col = "file" if "file" in binary_df.columns else "path"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                _points_rows(p, bytes(c))
                for p, c in zip(pdf[name_col], pdf["content"])
            ]
            if frames:
                yield pd.concat(frames)

    return binary_df.select(name_col, "content").mapInPandas(
        parse, schema=POINTS_SCHEMA
    )


def read_h5_morph_points(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed scan of ``.h5`` morphology files -> points table."""
    return parse_h5_frame(spark.read.format("binaryFile").load(path_glob))
