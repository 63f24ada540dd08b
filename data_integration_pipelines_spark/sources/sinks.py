"""Report sinks (S13-S16, S18): CSV, sparse-boolean TSV, JSON, XLSX.

The reference writes small reports from pandas (ref
src/trace/validation/validation.py:426-460, src/neuron_morphology/
validation/quality_metric.py:99-125). Here big outputs use the
distributed writers; report-sized outputs (sheet-per-bucket XLSX)
collect to the driver — reports are by construction small, and the
31-char sheet-name truncation / column autofit match the reference's
observable behavior.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink (S13). ``single_file`` coalesces for report-sized data."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def sparse_bool(ok: Column, detail: Column) -> Column:
    """Render expected/OK values as empty cells (S14 TSV convention;
    ref src/helpers.py:228-229)."""
    return F.when(ok, F.lit("")).otherwise(detail.cast("string"))


def write_tsv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """TSV sink (S14)."""
    out = df.coalesce(1) if single_file else df
    # emptyValue: sparse booleans must render as truly EMPTY cells (the
    # reference's TSV convention), not quoted ""
    out.write.mode("overwrite").option("header", "true").option("sep", "\t").option(
        "emptyValue", ""
    ).csv(path)


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines sink (S16)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def write_json_report(obj, path: str) -> None:
    """Driver-side JSON report with numpy-safe encoding
    (ref src/helpers.py:88-99 NumpyTypeEncoder)."""

    class _Encoder(json.JSONEncoder):
        def default(self, o):
            # arrays first — numpy arrays also expose .item(), which
            # raises for size != 1
            if getattr(o, "ndim", 0) > 0 and hasattr(o, "tolist"):
                return o.tolist()
            if hasattr(o, "item"):  # numpy scalars
                return o.item()
            return super().default(o)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, cls=_Encoder)


def truncate_sheet_name(name: str, limit: int = 31) -> str:
    """Excel's 31-char sheet-name cap (ref src/trace/validation/
    validation.py:445-447) + invalid-character scrub: Excel forbids
    []:*?/\\ in sheet titles (bucket names are org/project, so '/' is
    the common offender — openpyxl raises on it, and a verbatim write
    produces a workbook Excel wants to repair)."""
    for ch in "[]:*?/\\":
        name = name.replace(ch, "_")
    return name[:limit]


def dedupe_sheet_title(title: str, taken: Iterable[str]) -> str:
    """Next free ``title~i`` variant within Excel's 31-char cap. The
    prefix is sized to the suffix so every ``i`` yields a distinct name
    (a fixed-width prefix would re-truncate ``~100`` back to ``~10``
    and cycle forever once ~99 same-prefix sheets exist)."""
    taken = set(taken)
    i = 2
    while True:
        suffix = f"~{i}"
        candidate = title[: 31 - len(suffix)] + suffix
        if candidate not in taken:
            return candidate
        i += 1


def write_xlsx(
    sheets: Mapping[str, DataFrame],
    path: str,
    autofit: bool = True,
    max_rows_per_sheet: int = 100_000,
) -> None:
    """XLSX sink with sheet-per-bucket + column autofit (S15, ref
    src/trace/validation/validation.py:426-457 sheet-per-container
    report). Each sheet's DataFrame is collected — guarded by
    ``max_rows_per_sheet`` since XLSX is a report format, not a data
    format. Uses pandas+openpyxl when installed; otherwise the
    dependency-free OOXML writer (``xlsx_lite``) emits the workbook —
    the sink works everywhere.
    """
    collected: dict[str, DataFrame] = {}
    for name, df in sheets.items():
        n = df.count()
        if n > max_rows_per_sheet:
            raise ValueError(
                f"sheet {name!r} has {n} rows (> {max_rows_per_sheet}); "
                "XLSX is for report-sized outputs"
            )
        # scrub/truncation can collide two distinct input names (e.g.
        # 'org/x' vs 'org_x', or names differing only past char 31) —
        # disambiguate instead of silently overwriting a sheet
        title = truncate_sheet_name(name)
        if title in collected:
            title = dedupe_sheet_title(title, collected.keys())
        collected[title] = df

    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        with pd.ExcelWriter(path, engine="openpyxl") as writer:
            for sheet, df in collected.items():
                pdf = df.toPandas()
                pdf.to_excel(writer, sheet_name=sheet, index=False)
                if autofit:
                    ws = writer.sheets[sheet]
                    for idx, col in enumerate(pdf.columns):
                        width = max(
                            [len(str(col))]
                            + [len(str(v)) for v in pdf[col].head(1000)]
                        )
                        ws.column_dimensions[
                            ws.cell(row=1, column=idx + 1).column_letter
                        ].width = min(width + 2, 80)
    except ImportError:
        from .xlsx_lite import write_workbook

        write_workbook(
            {
                sheet: (df.columns, [list(r) for r in df.collect()])
                for sheet, df in collected.items()
            },
            path,
            autofit=autofit,
        )


def attach_distribution(
    resources: DataFrame,
    files: DataFrame,
    resource_id: str = "id",
    file_cols: Sequence[str] = ("name", "encodingFormat", "contentUrl", "contentSize"),
) -> DataFrame:
    """Attachment sink semantics (S18): append file rows to a resource's
    ``distribution`` array (ref src/neuron_morphology/validation/
    quality_metric_resource.py:73-76)."""
    new_dist = files.groupBy(F.col(resource_id).alias("__rid")).agg(
        F.collect_list(F.struct(*[F.col(c) for c in file_cols])).alias("__new")
    )
    joined = resources.join(new_dist, resources[resource_id] == F.col("__rid"), "left")
    merged = F.when(
        F.col("__new").isNotNull(),
        F.concat(F.coalesce(F.col("distribution"), F.array()), F.col("__new")),
    ).otherwise(F.col("distribution"))
    return joined.withColumn("distribution", merged).drop("__rid", "__new")


def profile_table(df: DataFrame) -> DataFrame:
    """ANALYZE-style one-pass profile: per-column row/null/distinct
    counts and min/max rendered as strings, for every profilable
    column (atomic types; nested/array/map/binary columns are skipped —
    min/max is meaningless there). One aggregate over the table, so the
    scan happens once regardless of column count."""
    atomic = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if not f.dataType.simpleString().startswith(("array", "map", "struct", "binary"))
    ]
    aggs = [F.count("*").alias("__n")]
    for name, dtype in atomic:
        c = F.col(name)
        # aggregate on the NATIVE type — casting to string first would
        # rank numerics lexicographically ("99" > "100"); rendering
        # happens on the one-row aggregate result below
        aggs += [
            (F.count("*") - F.count(c)).alias(f"__nulls_{name}"),
            F.countDistinct(c).alias(f"__nd_{name}"),
            F.min(c).alias(f"__mn_{name}"),
            F.max(c).alias(f"__mx_{name}"),
        ]
    one = df.agg(*aggs)

    def _render(colname: str, dtype: str):
        c = F.col(colname)
        if dtype.startswith("timestamp"):
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        return c.cast("string")

    structs = [
        F.struct(
            F.lit(name).alias("col"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{name}").alias("n_nulls"),
            F.col(f"__nd_{name}").alias("n_distinct"),
            _render(f"__mn_{name}", dtype).alias("min_val"),
            _render(f"__mx_{name}", dtype).alias("max_val"),
        )
        for name, dtype in atomic
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*").orderBy("col")
