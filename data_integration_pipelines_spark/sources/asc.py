"""ASC / Neurolucida morphology source (S9 sibling format).

The reference consumes Neurolucida ASC alongside SWC: its validation
fixtures are inline ASC literals
(src/neuron_morphology/validation/load_test_data.py:22-99, the
unifurcation/multifurcation cases referenced by validator.py:286,295)
and its converter emits swc/asc/h5 triplets
(check_swc_on_resource.py:56-166). This module parses the ASC grammar
into the SAME points schema as ``sources/swc.py`` —
``(file, n, type, x, y, z, radius, parent)`` — so every morphology
operator (battery, tree metrics, registration) runs on either format
or a mixed directory.

Grammar handled (the subset the reference's data exercises):

- top-level s-expression forms; ``;`` comments; ``<...>`` spine
  markers stripped
- header sublists of bare words name the structure —
  ``(CellBody)``/``(Soma)`` -> SWC type 1, ``(Axon)`` -> 2,
  ``(Dendrite)`` -> 3, ``(Apical)`` -> 4 — attribute sublists like
  ``(Color Blue)`` are ignored
- points are ``(x y z d)`` with d = DIAMETER (Neurolucida convention);
  radius = d/2, matching the neurom/MorphIO loaders the reference uses
- consecutive points chain parent -> child; a parenthesized group
  splits the tree at the current point, ``|`` separating sibling
  subtrees — a group with ONE subtree is exactly the "unifurcation"
  defect the reference's validator flags
- each top-level form roots its own tree (parent = -1); ``n`` numbers
  sequentially within a file in document order

Scale shape: parsing is a genuine per-file kernel, so it runs as an
Arrow-batched ``mapInPandas`` over whole-file rows — one Python call
per batch of files, never per line; downstream operators see the same
partitioned points table the SWC text scan produces.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASC_POINTS_SCHEMA = (
    "file string, n int, type int, x double, y double, z double, "
    "radius double, parent int"
)

_TYPE_KEYWORDS = {
    "cellbody": 1,
    "soma": 1,
    "axon": 2,
    "dendrite": 3,
    "apical": 4,
}

_SPINE_RE = re.compile(r"<[^>]*>")
_TOKEN_RE = re.compile(r'"[^"]*"|[()|]|[^\s()|"]+')


def _tokenize(text: str) -> list[str]:
    out: list[str] = []
    for line in text.splitlines():
        line = line.split(";", 1)[0]
        line = _SPINE_RE.sub(" ", line)
        out.extend(_TOKEN_RE.findall(line))
    return out


def _parse_forms(tokens: list[str]) -> list[list]:
    """Token stream -> list of top-level nested lists."""
    pos = 0

    def parse_list() -> list:
        nonlocal pos
        pos += 1  # consume '('
        items: list = []
        while pos < len(tokens) and tokens[pos] != ")":
            if tokens[pos] == "(":
                items.append(parse_list())
            else:
                items.append(tokens[pos])
                pos += 1
        pos += 1  # consume ')'
        return items

    forms: list[list] = []
    while pos < len(tokens):
        if tokens[pos] == "(":
            forms.append(parse_list())
        else:
            pos += 1  # stray top-level token
    return forms


def _is_number(tok) -> bool:
    if not isinstance(tok, str):
        return False
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _is_point(item) -> bool:
    return (
        isinstance(item, list)
        and len(item) >= 4
        and all(_is_number(t) for t in item[:4])
    )


def _form_type(form: list) -> int:
    """SWC type code from the form's header word-lists."""
    for it in form:
        if isinstance(it, list) and it and all(
            isinstance(s, str) and not _is_number(s) for s in it
        ):
            for s in it:
                code = _TYPE_KEYWORDS.get(s.strip('"').lower())
                if code is not None:
                    return code
    return 0


def _split_on_pipe(items: list) -> list[list]:
    groups: list[list] = [[]]
    for it in items:
        if it == "|":
            groups.append([])
        else:
            groups[-1].append(it)
    return groups


def parse_asc_text(text: str) -> list[tuple[int, int, float, float, float, float, int]]:
    """Parse one ASC document into ``(n, type, x, y, z, radius, parent)``
    rows (pure function — unit-testable without Spark)."""
    rows: list[tuple[int, int, float, float, float, float, int]] = []

    def walk(items: list, parent: int, stype: int) -> None:
        cur = parent
        for it in items:
            if not isinstance(it, list):
                continue  # bare marker token
            if _is_point(it):
                x, y, z, d = (float(v) for v in it[:4])
                n = len(rows) + 1
                rows.append((n, stype, x, y, z, d / 2.0, cur))
                cur = n
            elif any(s == "|" for s in it):
                for group in _split_on_pipe(it):
                    walk(group, cur, stype)
            elif it and all(isinstance(s, str) and not _is_number(s) for s in it):
                continue  # header / attribute list, e.g. (Color Blue)
            else:
                walk(it, cur, stype)  # single-subtree group (unifurcation)

    for form in _parse_forms(_tokenize(text)):
        walk(form, -1, _form_type(form))
    return rows


def parse_asc_frame(df: DataFrame, file_col: str = "file", text_col: str = "text") -> DataFrame:
    """(file, text) rows -> the points table, Arrow-batched."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file", "n", "type", "x", "y", "z", "radius", "parent"]
        for pdf in batches:
            rows = []
            for f, t in zip(pdf[file_col], pdf[text_col]):
                for pt in parse_asc_text(t):
                    rows.append((f, *pt))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(fn, schema=ASC_POINTS_SCHEMA)


def read_asc_points(
    spark: SparkSession, path: str, glob_filter: str | None = None
) -> DataFrame:
    """Read ASC file(s) into the points table (same schema as
    ``read_swc_points``). ``glob_filter`` (e.g. ``*.asc``) scopes a
    directory read without erroring when nothing matches."""
    reader = spark.read
    if glob_filter is not None:
        reader = reader.option("pathGlobFilter", glob_filter)
    raw = reader.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value").alias("text")
    )
    return parse_asc_frame(raw, "file", "text")


_TYPE_NAMES = {1: "CellBody", 2: "Axon", 3: "Dendrite", 4: "Apical"}


def render_asc_text(points: list[tuple[int, int, float, float, float, float, int]]) -> str:
    """Inverse of ``parse_asc_text``: (n, type, x, y, z, radius, parent)
    rows -> Neurolucida ASC text (the reference's swc->asc conversion,
    check_swc_on_resource.py:56-166, as a pure function).

    Soma (type 1) points become one ``(CellBody)`` contour form; every
    other root (parent -1 or parent is a soma point) roots its own
    typed form. Chains render as consecutive points; a point with
    multiple children opens a branch group with ``|`` separators;
    diameters are 2x radius. ``parse_asc_text(render_asc_text(p))``
    reproduces the tree (ids renumber in document order).

    Format limitation, inherent to ASC: a form carries ONE structure
    type, so per-point type changes inside a neurite (SWC allows them;
    the validator flags them as heterogeneous) render with the root's
    type — exactly what any swc->asc converter must do."""
    by_n = {p[0]: p for p in points}
    children: dict[int, list[int]] = {}
    for n, _t, _x, _y, _z, _r, parent in points:
        children.setdefault(parent, []).append(n)
    for v in children.values():
        v.sort()

    def fmt(v: float) -> str:
        return f"{v:g}"

    def point_str(n: int) -> str:
        _, _t, x, y, z, r, _ = by_n[n]
        return f"({fmt(x)} {fmt(y)} {fmt(z)} {fmt(2 * r)})"

    def render_chain(n: int, indent: str) -> list[str]:
        out = [f"{indent}{point_str(n)}"]
        while True:
            kids = [k for k in children.get(n, []) if by_n[k][1] != 1]
            if not kids:
                return out
            if len(kids) == 1:
                n = kids[0]
                out.append(f"{indent}{point_str(n)}")
                continue
            out.append(f"{indent}(")
            for i, k in enumerate(kids):
                if i:
                    out.append(f"{indent}|")
                out.extend(render_chain(k, indent + "  "))
            out.append(f"{indent})")
            return out

    soma = sorted(n for n, t, *_ in points if t == 1)
    forms: list[str] = []
    if soma:
        forms.append("((CellBody) " + " ".join(point_str(n) for n in soma) + ")")
    soma_set = set(soma)
    roots = sorted(
        n
        for n, t, _x, _y, _z, _r, parent in points
        if t != 1 and (parent not in by_n or parent in soma_set)
    )
    for root in roots:
        tname = _TYPE_NAMES.get(by_n[root][1], "Dendrite")
        lines = [f"(({tname})"] + render_chain(root, "  ") + [")"]
        forms.append("\n".join(lines))
    return "\n\n".join(forms) + "\n"


def render_asc_frame(points: DataFrame) -> DataFrame:
    """Points table -> one (file, text) ASC document per file,
    Arrow-batched via applyInPandas (each file's rows are grouped to
    one task; rendering is a genuine per-file kernel)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("n")
        rows = [
            (int(r.n), int(r.type), float(r.x), float(r.y), float(r.z),
             float(r.radius), int(r.parent))
            for r in pdf.itertuples()
        ]
        return pd.DataFrame(
            [{"file": pdf["file"].iloc[0], "text": render_asc_text(rows)}]
        )

    return points.groupBy("file").applyInPandas(fn, schema="file string, text string")


def read_morphology_points(spark: SparkSession, directory: str) -> DataFrame:
    """Mixed-format morphology scan: SWC and ASC files under one
    directory, unioned into a single points table — the whole battery
    runs format-agnostically downstream. Either format may be absent
    (pathGlobFilter yields an empty frame instead of a missing-path
    error)."""
    from .swc import read_swc_points

    swc = read_swc_points(spark, directory, glob_filter="*.swc")
    asc = read_asc_points(spark, directory, glob_filter="*.asc")
    return swc.unionByName(asc)
