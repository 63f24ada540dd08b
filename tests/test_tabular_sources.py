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


def _write_messy_sheet(path: str) -> None:
    """The reference's sheet shape: junk first row, real header second,
    whitespace-only cells that must clean to NA (skiprows=1,
    na_values=' ')."""
    from data_integration_pipelines_spark.sources.xlsx_lite import write_workbook

    write_workbook(
        {
            "Sheet1": (
                ["junk", None, None],
                [
                    [" name ", "region", "score"],
                    ["m1", "CA1", 1.5],
                    ["m2", " ", 2],
                    [None, None, None],
                ],
            )
        },
        path,
    )


def test_read_excel_dependency_free(spark, tmp_path):
    """S8 runs for real with no openpyxl: the stdlib OOXML reader +
    the same clean_metadata_frame pipeline as the CSV twin."""
    p = str(tmp_path / "meta.xlsx")
    _write_messy_sheet(p)
    df = read_excel(spark, p, skiprows=1)
    assert set(df.columns) == {"name", "region", "score"}
    rows = {r["name"]: (r["region"], r["score"]) for r in df.collect()}
    assert rows == {"m1": ("CA1", 1.5), "m2": (None, 2.0)}


def test_read_excel_sheet_by_name(spark, tmp_path):
    from data_integration_pipelines_spark.sources.xlsx_lite import write_workbook

    p = str(tmp_path / "multi.xlsx")
    write_workbook(
        {
            "first": (["a"], [[1]]),
            "second": (["b", "flag"], [[2, True], [3, False]]),
        },
        p,
    )
    df = read_excel(spark, p, sheet_name="second", skiprows=0)
    got = sorted((r["b"], r["flag"]) for r in df.collect())
    assert got == [(2, True), (3, False)]


@pytest.mark.realdeps
def test_read_excel_openpyxl_branch(spark, tmp_path):
    """Exercises the pandas+openpyxl branch wherever the dep exists
    (skips where it doesn't — the stdlib branch is tested above)."""
    pytest.importorskip("openpyxl")
    p = str(tmp_path / "meta.xlsx")
    _write_messy_sheet(p)
    df = read_excel(spark, p, skiprows=1)
    assert {r["name"] for r in df.collect()} == {"m1", "m2"}


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
