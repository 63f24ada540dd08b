"""Excel metadata-sheet source (S8) and zip ingestion source (S12).

- Excel: the reference reads curator-maintained sheets with messy
  headers — ``pd.read_excel(skiprows=1, na_values=' ')`` (ref
  src/neuron_morphology/morphology_registration.py:79-89,
  src/neuron_morphology/validation/region_comparison.py:467). Sheets
  are small (hundreds of rows), so the read happens on the driver and
  the frame is parallelized with ``createDataFrame`` — they then act
  as broadcast dimension inputs to joins. ``read_excel`` is REAL with
  no binary dependency (the stdlib OOXML reader in ``xlsx_lite``;
  pandas+openpyxl preferred where installed); the header cleaning
  lives in ``clean_metadata_frame``, shared with the CSV twin.

- Zip: the reference walks nested zips (zip-in-zip) extracting
  ``*.swc`` (ref src/neuron_morphology/morphology_registration.py:28-48).
  Extraction is driver-side (archives are not splittable anyway) into
  a staging dir, then the files enter the engine through a normal
  ``binaryFile``/text scan — so everything downstream is a
  distributed read of loose files, which is also the 100 TB shape
  (unpack once to object storage; scan forever).
"""

from __future__ import annotations

import fnmatch
import os
import zipfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def clean_metadata_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """The reference's sheet hygiene: strip whitespace-only cells to NA,
    strip column-name whitespace, drop all-empty rows/columns."""
    pdf = pdf.rename(columns=lambda c: str(c).strip())
    pdf = pdf.replace(r"^\s*$", pd.NA, regex=True)
    pdf = pdf.dropna(axis=0, how="all").dropna(axis=1, how="all")
    return pdf


def read_metadata_csv(
    spark: SparkSession, path: str, skiprows: int = 0
) -> DataFrame:
    """CSV twin of the Excel metadata reader (same driver-side pandas
    cleaning, same createDataFrame hand-off)."""
    pdf = clean_metadata_frame(pd.read_csv(path, skiprows=skiprows))
    return spark.createDataFrame(pdf)


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: int | str = 0,
    skiprows: int = 1,
) -> DataFrame:
    """S8 Excel source (ref pd.read_excel(skiprows=1, na_values=' ') at
    src/neuron_morphology/morphology_registration.py:79-89). Prefers
    pandas+openpyxl when installed; otherwise the dependency-free OOXML
    reader (``xlsx_lite``) parses the sheet directly — the source works
    everywhere, with identical cleaning either way."""
    try:
        import openpyxl  # noqa: F401

        pdf = pd.read_excel(
            path, sheet_name=sheet_name, skiprows=skiprows, na_values=" "
        )
    except ImportError:
        from .xlsx_lite import read_workbook

        book = read_workbook(path)
        name = (
            list(book)[sheet_name] if isinstance(sheet_name, int) else sheet_name
        )
        columns, rows = book[name]
        # skiprows semantics match pd.read_excel: drop N leading rows,
        # the NEXT row becomes the header
        grid = [columns] + [list(r) for r in rows]
        grid = grid[skiprows:]
        if not grid:
            return spark.createDataFrame(pd.DataFrame())
        header = [str(c) if c is not None else "" for c in grid[0]]
        pdf = pd.DataFrame(grid[1:], columns=header)
        pdf = pdf.replace(" ", pd.NA)  # na_values=' ' twin
    pdf = clean_metadata_frame(pdf)
    # pd.NA chokes Spark's non-Arrow row conversion (a vanilla session
    # may not have Arrow enabled) — hand over plain Nones
    pdf = pdf.astype(object).where(pd.notna(pdf), None)
    return spark.createDataFrame(pdf)


def extract_zip_tree(zip_path: str, staging_dir: str, pattern: str = "*") -> list[str]:
    """Recursively extract ``zip_path`` (including zips nested inside
    zips) into ``staging_dir``; return extracted file paths matching
    ``pattern``. Driver-side — archives are inherently serial."""
    os.makedirs(staging_dir, exist_ok=True)
    out: list[str] = []
    pending = [zip_path]
    seen = 0
    while pending:
        zp = pending.pop()
        sub = os.path.join(staging_dir, f"z{seen}")
        seen += 1
        with zipfile.ZipFile(zp) as zf:
            zf.extractall(sub)
        for root, _dirs, files in os.walk(sub):
            for name in files:
                full = os.path.join(root, name)
                if name.lower().endswith(".zip"):
                    pending.append(full)
                elif fnmatch.fnmatch(name, pattern):
                    out.append(full)
    return sorted(out)


def ingest_zip(
    spark: SparkSession,
    zip_path: str,
    staging_dir: str,
    pattern: str = "*.swc",
) -> DataFrame:
    """S12: unpack (nested) zip to staging, scan the matching files as
    a binaryFile DataFrame (path, modificationTime, length, content)."""
    files = extract_zip_tree(zip_path, staging_dir, pattern)
    if not files:
        raise FileNotFoundError(f"no files matching {pattern!r} in {zip_path}")
    return spark.read.format("binaryFile").load(files)
