"""Report sinks: CSV/TSV/JSON writers, XLSX gating, attachment sink."""

from __future__ import annotations

import glob
import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_pipelines_spark.sources.sinks import (
    attach_distribution,
    sparse_bool,
    truncate_sheet_name,
    write_csv,
    write_json,
    write_json_report,
    write_tsv,
    write_xlsx,
)


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [(1, "a", True), (2, "b", False)], "id int, name string, ok boolean"
    )


def _read_single(path: str, pattern: str) -> list[str]:
    files = glob.glob(f"{path}/{pattern}")
    assert len(files) == 1, files
    return open(files[0]).read().splitlines()


def test_write_csv_single_file(small_df, tmp_path):
    out = str(tmp_path / "csv")
    write_csv(small_df, out, single_file=True)
    lines = _read_single(out, "part-*.csv")
    assert lines[0] == "id,name,ok"
    assert sorted(lines[1:]) == ["1,a,true", "2,b,false"]


def test_write_tsv_sparse_bool(small_df, tmp_path):
    out = str(tmp_path / "tsv")
    df = small_df.select(
        "id", sparse_bool(F.col("ok"), F.col("name")).alias("check")
    )
    write_tsv(df, out)
    lines = _read_single(out, "part-*.csv")
    assert lines[0] == "id\tcheck"
    # expected/ok rows render as EMPTY cells, failures carry the detail
    assert sorted(lines[1:]) == ["1\t", "2\tb"]


def test_write_json_lines(small_df, tmp_path):
    out = str(tmp_path / "json")
    write_json(small_df, out, single_file=True)
    rows = [json.loads(ln) for ln in _read_single(out, "part-*.json")]
    assert {r["id"]: r["name"] for r in rows} == {1: "a", 2: "b"}


def test_write_json_report_numpy_safe(tmp_path):
    path = str(tmp_path / "rep" / "report.json")
    write_json_report(
        {"n": np.int64(3), "vals": np.array([1.5, 2.5]), "name": "x"}, path
    )
    obj = json.load(open(path))
    assert obj == {"n": 3, "vals": [1.5, 2.5], "name": "x"}


def test_truncate_sheet_name():
    assert truncate_sheet_name("x" * 40) == "x" * 31
    assert truncate_sheet_name("short") == "short"


def test_dedupe_sheet_title_survives_hundredth_collision():
    from data_integration_pipelines_spark.sources.sinks import dedupe_sheet_title

    base = "x" * 31
    taken = (
        {base}
        | {base[:29] + f"~{i}" for i in range(2, 10)}
        | {base[:28] + f"~{i}" for i in range(10, 100)}
        | {base[:27] + f"~{i}" for i in range(100, 120)}
    )
    got = dedupe_sheet_title(base, taken)
    # a fixed 28-char prefix would re-truncate '~100' to '~10' and loop;
    # the sized prefix keeps emitting fresh <=31-char names
    assert got == base[:27] + "~120" and len(got) <= 31
    assert dedupe_sheet_title("ab", {"ab"}) == "ab~2"


def test_write_xlsx_dependency_free_roundtrip(spark, small_df, tmp_path):
    """S15 runs for real with no openpyxl: the stdlib OOXML writer
    emits a workbook our reader (and Excel) can open; sheet names
    truncate at 31 chars; types survive the round trip."""
    from data_integration_pipelines_spark.sources.xlsx_lite import read_workbook

    typed = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b <&> c", 2.0, False)],
        "id long, name string, score double, flag boolean",
    )
    long_name = "x" * 40
    path = str(tmp_path / "report.xlsx")
    write_xlsx({long_name: typed, "second": small_df}, path)
    book = read_workbook(path)
    assert set(book) == {"x" * 31, "second"}
    cols, rows = book["x" * 31]
    assert cols == ["id", "name", "score", "flag"]
    assert sorted(rows) == [[1, "a", 1.5, True], [2, "b <&> c", 2.0, False]]


def test_write_xlsx_row_guard(small_df, tmp_path):
    with pytest.raises(ValueError, match="report-sized"):
        write_xlsx(
            {"s": small_df}, str(tmp_path / "r.xlsx"), max_rows_per_sheet=1
        )


@pytest.mark.realdeps
def test_write_xlsx_openpyxl_branch(small_df, tmp_path):
    pytest.importorskip("openpyxl")
    import pandas as pd

    path = str(tmp_path / "r.xlsx")
    write_xlsx({"sheet": small_df}, path)
    assert len(pd.read_excel(path)) == small_df.count()


def test_attach_distribution(spark):
    resources = spark.createDataFrame(
        [
            ("r1", [{"name": "old.swc", "encodingFormat": "swc",
                     "contentUrl": "u0", "contentSize": 1}]),
            ("r2", None),
        ],
        "id string, distribution array<struct<name:string,encodingFormat:string,contentUrl:string,contentSize:int>>",
    )
    files = spark.createDataFrame(
        [("r1", "new.h5", "h5", "u1", 10), ("r2", "a.swc", "swc", "u2", 5)],
        "id string, name string, encodingFormat string, contentUrl string, contentSize int",
    )
    out = {
        r["id"]: [d["name"] for d in (r["distribution"] or [])]
        for r in attach_distribution(resources, files).collect()
    }
    assert out == {"r1": ["old.swc", "new.h5"], "r2": ["a.swc"]}


def test_write_xlsx_sheet_name_collisions(spark, tmp_path):
    """Two buckets whose names scrub/truncate identically must BOTH
    land in the workbook (disambiguated), not silently overwrite."""
    import zipfile

    from data_integration_pipelines_spark.sources.sinks import write_xlsx

    a = spark.createDataFrame([(1,)], "x long")
    b = spark.createDataFrame([(2,)], "x long")
    path = str(tmp_path / "wb.xlsx")
    write_xlsx({"org/x": a, "org_x": b}, path)
    with zipfile.ZipFile(path) as z:
        sheets = [n for n in z.namelist() if n.startswith("xl/worksheets/")]
    assert len(sheets) == 2
