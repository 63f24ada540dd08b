"""Dependency-free OOXML reader/writer internals: cell typing, sparse
grids, sharedStrings (emitted by Excel/openpyxl but not by our writer —
the reader must handle both)."""

from __future__ import annotations

import zipfile

from data_integration_pipelines_spark.sources.xlsx_lite import (
    col_letter,
    read_workbook,
    write_workbook,
)


def test_col_letter():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_roundtrip_types_and_missing(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_workbook(
        {
            "s": (
                ["i", "f", "s", "b", "gap"],
                [
                    [1, 1.25, "héllo <&>", True, None],
                    [-2, 3.0, "", False, "x"],
                ],
            )
        },
        p,
    )
    cols, rows = read_workbook(p)["s"]
    assert cols == ["i", "f", "s", "b", "gap"]
    assert rows[0] == [1, 1.25, "héllo <&>", True, None]
    assert rows[1] == [-2, 3.0, "", False, "x"]


def test_reads_shared_strings_and_sparse_cells(tmp_path):
    """Hand-crafted workbook the way Excel/openpyxl writes it: t="s"
    cells indexing sharedStrings.xml, sparse rows (missing cells and a
    skipped row), rich-text <si> runs that must concatenate."""
    p = str(tmp_path / "excel.xlsx")
    m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types"><Default Extension="rels" ContentType="application/'
            'vnd.openxmlformats-package.relationships+xml"/><Default '
            'Extension="xml" ContentType="application/xml"/></Types>',
        )
        zf.writestr(
            "_rels/.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{m}" xmlns:r="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships"><sheets>'
            '<sheet name="data" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet\" "
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{m}" count="3" uniqueCount="3">'
            "<si><t>name</t></si><si><t>va</t><t>lue</t></si>"
            "<si><t xml:space=\"preserve\"> padded </t></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{m}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            # row 2 entirely absent; row 3 has only column C
            '<row r="3"><c r="C3" t="s"><v>2</v></c></row>'
            '<row r="4"><c r="A4"><v>7</v></c><c r="B4" t="str"><v>cached</v></c></row>'
            "</sheetData></worksheet>",
        )
    cols, rows = read_workbook(p)["data"]
    assert cols == ["name", "", "value"]  # rich-text si concatenated
    # rows come back padded to header width; the absent row 2 is an
    # all-None row, sparse cells land at their declared positions
    assert rows[0] == [None, None, None]
    assert rows[1] == [None, None, " padded "]
    assert rows[2] == [7, "cached", None]


def test_rejects_malformed_inputs(tmp_path):
    import pytest
    import zipfile

    p = tmp_path / "bad.xlsx"
    p.write_bytes(b"not a zip at all")
    with pytest.raises(zipfile.BadZipFile):
        read_workbook(str(p))
    # a zip that lacks the workbook part fails loudly, not silently
    q = tmp_path / "empty.xlsx"
    with zipfile.ZipFile(q, "w") as zf:
        zf.writestr("unrelated.txt", "x")
    with pytest.raises(KeyError):
        read_workbook(str(q))
