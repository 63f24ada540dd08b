"""Dependency-free XLSX read/write (S8 source, S15 sink).

XLSX is a zip of OOXML XML parts; nothing about report-sized Excel I/O
needs a binary dependency, so this module implements the subset the
reference exercises with ``zipfile`` + ``xml.etree`` only:

- **write**: one worksheet per sheet name, header row + typed cells
  (numbers, booleans, inline strings), column-width autofit. Inline
  strings (``t="inlineStr"``) keep the writer single-pass — no shared
  string table to build. Readable by Excel/LibreOffice/openpyxl.
- **read**: workbook -> sheet-name/target resolution via the package
  rels, shared strings, inline strings, numeric/boolean/formula-cached
  cells, sparse rows (cells carry explicit ``r="B7"`` references).

This replaces the openpyxl import gate the engine carried while the
container lacked the dep — the reference behaviors (31-char sheet
truncation ref src/trace/validation/validation.py:445-447, messy-sheet
cleaning ref src/neuron_morphology/morphology_registration.py:79-89)
now run for real everywhere. When openpyxl IS present the higher-level
entry points still prefer it (``@realdeps`` tests cover that branch);
this module is the always-available floor.

Excel serial dates are NOT decoded (cells formatted as dates arrive as
serial numbers): the reference's sheets carry ISO strings, and date
typing belongs to the engine's F5 date functions, not the transport.
"""

from __future__ import annotations

import math
import re
import zipfile
from collections.abc import Mapping, Sequence
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "pr": "http://schemas.openxmlformats.org/package/2006/relationships",
}
_MAIN = _NS["m"]
_REL = _NS["r"]


def col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters (0->A, 26->AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _ref_to_col(ref: str) -> int:
    """A1-style reference -> 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


# ---------------------------------------------------------------- write

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value) -> str:
    """One typed <c> element; None/NaN cells are omitted by the caller."""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
            value = str(value)  # fall through to string cell
        else:
            return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _is_missing(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


def write_workbook(
    sheets: Mapping[str, tuple[Sequence[str], Sequence[Sequence]]],
    path: str,
    autofit: bool = True,
    max_col_width: int = 80,
) -> None:
    """Write ``{sheet_name: (columns, rows)}`` to ``path`` as XLSX.

    Sheet names are used verbatim — callers enforce Excel's 31-char cap
    (``sinks.truncate_sheet_name``) so the truncation rule lives in ONE
    place. ``autofit`` emits <cols> widths = longest rendered value + 2,
    capped at ``max_col_width`` (mirrors the reference's report styling).
    """
    names = list(sheets)
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    wb_sheets = "\n".join(
        f'<sheet name="{escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<workbook xmlns="{_MAIN}" xmlns:r="{_REL}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = "\n".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(names))
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        f'relationships">{wb_rels}</Relationships>'
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides)
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(names):
            columns, rows = sheets[name]
            parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
            parts.append(f'<worksheet xmlns="{_MAIN}">')
            if autofit:
                widths = []
                for c, col in enumerate(columns):
                    w = len(str(col))
                    for row in rows:
                        if c < len(row) and not _is_missing(row[c]):
                            w = max(w, len(str(row[c])))
                    widths.append(
                        f'<col min="{c + 1}" max="{c + 1}" '
                        f'width="{min(w + 2, max_col_width)}" customWidth="1"/>'
                    )
                parts.append("<cols>" + "".join(widths) + "</cols>")
            parts.append("<sheetData>")
            header = "".join(
                _cell_xml(f"{col_letter(c)}1", str(col))
                for c, col in enumerate(columns)
            )
            parts.append(f'<row r="1">{header}</row>')
            for rix, row in enumerate(rows, start=2):
                cells = "".join(
                    _cell_xml(f"{col_letter(c)}{rix}", v)
                    for c, v in enumerate(row)
                    if not _is_missing(v)
                )
                parts.append(f'<row r="{rix}">{cells}</row>')
            parts.append("</sheetData></worksheet>")
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", "".join(parts))


# ----------------------------------------------------------------- read


def _cell_value(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        node = cell.find("m:is", _NS)
        return "".join(n.text or "" for n in node.iter(f"{{{_MAIN}}}t"))
    v = cell.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t in ("str", "e"):  # formula cache / error
        return v.text
    # numeric: int when exact, float otherwise
    text = v.text
    try:
        f = float(text)
    except ValueError:
        return text
    return int(f) if f.is_integer() and "e" not in text.lower() and "." not in text else f


def read_workbook(path: str) -> dict[str, tuple[list[str], list[list]]]:
    """Read every worksheet -> ``{name: (columns, rows)}``. First row is
    the header; sparse cells land in their ``r=``-declared positions
    (missing cells -> None); rows are padded to header width."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.iter(f"{{{_NS['pr']}}}Relationship")
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{{{_MAIN}}}si"):
                shared.append(
                    "".join(n.text or "" for n in si.iter(f"{{{_MAIN}}}t"))
                )
        out: dict[str, tuple[list[str], list[list]]] = {}
        for sheet in wb.iter(f"{{{_MAIN}}}sheet"):
            name = sheet.get("name")
            target = rel_target[sheet.get(f"{{{_REL}}}id")].lstrip("/")
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(zf.read(target))
            grid: list[list] = []
            for rix, row in enumerate(ws.iter(f"{{{_MAIN}}}row")):
                cells: list = []
                for cell in row.iter(f"{{{_MAIN}}}c"):
                    ref = cell.get("r")
                    cix = _ref_to_col(ref) if ref else len(cells)
                    while len(cells) <= cix:
                        cells.append(None)
                    cells[cix] = _cell_value(cell, shared)
                declared = row.get("r")
                target_rix = int(declared) - 1 if declared else rix
                while len(grid) < target_rix:
                    grid.append([])
                grid.append(cells)
            if not grid:
                out[name] = ([], [])
                continue
            header = [str(c) if c is not None else "" for c in grid[0]]
            width = len(header)
            rows = [
                (r + [None] * (width - len(r)))[:width] for r in grid[1:]
            ]
            out[name] = (header, rows)
        return out
