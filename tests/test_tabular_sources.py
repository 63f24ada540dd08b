"""Excel/CSV metadata source cleaning and nested-zip ingestion."""

from __future__ import annotations

import zipfile

import pandas as pd
import pytest

from data_integration_pipelines_spark.sources.tabular import (
    clean_metadata_frame,
    extract_zip_tree,
    ingest_zip,
    read_excel,
    read_metadata_csv,
)

SWC_BODY = b"# comment\n1 1 0.0 0.0 0.0 1.0 -1\n2 3 1.0 0.0 0.0 0.5 1\n"


def test_clean_metadata_frame():
    pdf = pd.DataFrame(
        {
            " Cell Name ": ["a", " ", "c", None],
            "Region": ["CA1", "", "CA3", None],
            "Empty": [None, "", " ", None],
        }
    )
    out = clean_metadata_frame(pdf)
    assert list(out.columns) == ["Cell Name", "Region"]  # stripped + empty col dropped
    assert len(out) == 2  # whitespace-only and all-empty rows dropped
    assert out["Cell Name"].tolist() == ["a", "c"]


def test_read_metadata_csv(spark, tmp_path):
    p = tmp_path / "meta.csv"
    p.write_text("junk header line\nname,region\nm1,CA1\nm2, \n")
    df = read_metadata_csv(spark, str(p), skiprows=1)
    rows = {r["name"]: r["region"] for r in df.collect()}
    assert rows == {"m1": "CA1", "m2": None}


def test_read_excel_gated(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl installed; gating path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="read_metadata_csv"):
        read_excel(spark, str(tmp_path / "x.xlsx"))


def _make_nested_zip(tmp_path):
    inner = tmp_path / "inner.zip"
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("deep/m3.swc", SWC_BODY)
        zf.writestr("deep/skip.txt", b"not a morphology")
    outer = tmp_path / "outer.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("m1.swc", SWC_BODY)
        zf.writestr("sub/m2.swc", SWC_BODY)
        zf.write(inner, "nested/inner.zip")
    return outer


def test_extract_zip_tree_nested(tmp_path):
    outer = _make_nested_zip(tmp_path)
    files = extract_zip_tree(str(outer), str(tmp_path / "stage"), "*.swc")
    names = sorted(f.rsplit("/", 1)[-1] for f in files)
    assert names == ["m1.swc", "m2.swc", "m3.swc"]  # nested zip walked


def test_ingest_zip_binary_scan(spark, tmp_path):
    outer = _make_nested_zip(tmp_path)
    df = ingest_zip(spark, str(outer), str(tmp_path / "stage2"), "*.swc")
    rows = df.select("path", "length").collect()
    assert len(rows) == 3
    assert all(r["length"] == len(SWC_BODY) for r in rows)
    with pytest.raises(FileNotFoundError):
        ingest_zip(spark, str(outer), str(tmp_path / "stage3"), "*.nwb")
