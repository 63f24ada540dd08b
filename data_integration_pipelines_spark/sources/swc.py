"""SWC morphology source (S9): whitespace-separated point tables with
``#`` comments — a tree encoded as a table via parent pointers.

Re-expresses src/neuron_morphology/validation/check_swc_on_resource.py:20-48
(``pd.read_csv(sep='\\s+', comment='#')`` + header synonym
normalization ``r`` -> ``radius``) as a distributed text scan:
``spark.read.text`` over a glob, per-file via ``input_file_name()``,
comment/blank filtering, regex split. One SWC file stays within one
task's rows (files are whole-file line-split by the text source), and
the points table partitions naturally by file for per-file kernels.

Column synonyms seen in the wild (header comment line): ``n|id|index``,
``type|T|structure``, ``r|radius``, ``parent|parent_id|pid``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SWC_COLUMNS = ("n", "type", "x", "y", "z", "radius", "parent")

_SYNONYMS = {
    "n": "n", "id": "n", "index": "n",
    "type": "type", "t": "type", "structure": "type",
    "x": "x", "y": "y", "z": "z",
    "r": "radius", "radius": "radius",
    "parent": "parent", "parent_id": "parent", "pid": "parent",
}

_CASTS = {
    "n": "int",
    "type": "int",
    "x": "double",
    "y": "double",
    "z": "double",
    "radius": "double",
    "parent": "int",
}


def normalize_header(tokens: list[str]) -> list[str]:
    """Map header-comment column synonyms onto canonical SWC names."""
    out = []
    for t in tokens:
        key = t.strip().lower()
        if key not in _SYNONYMS:
            raise ValueError(f"unknown SWC column {t!r}; known: {sorted(_SYNONYMS)}")
        out.append(_SYNONYMS[key])
    return out


def read_swc_points(
    spark: SparkSession, path_glob: str, glob_filter: str | None = None
) -> DataFrame:
    """Read SWC file(s) into the points table
    ``(file, n, type, x, y, z, radius, parent)``.

    Uses the canonical SWC column order (the overwhelming convention);
    ``normalize_header`` is provided for callers that sniff an explicit
    header comment and need to reorder first. ``glob_filter`` (e.g.
    ``*.swc``) scopes a directory read without erroring when nothing
    matches.
    """
    reader = spark.read
    if glob_filter is not None:
        reader = reader.option("pathGlobFilter", glob_filter)
    lines = reader.text(path_glob).select(
        F.input_file_name().alias("file"), F.trim(F.col("value")).alias("line")
    )
    data = lines.filter((F.col("line") != "") & ~F.col("line").startswith("#"))
    parts = F.split(F.col("line"), r"\s+")
    cols = [
        F.element_at(parts, i + 1).cast(_CASTS[name]).alias(name)
        for i, name in enumerate(SWC_COLUMNS)
    ]
    return data.select("file", *cols)
