"""End-to-end pipeline compositions — one per reference entry point
(SURVEY §3, §7 Phase 4). Each is a pure composition of the operator
library: no new physics, just the reference's CLI jobs re-expressed as
single declarative plans.

EP1  trace_audit              ref src/trace/validation/validation.py
EP2  morphology_quality       ref src/neuron_morphology/validation/
                                  quality_metric_resource.py
EP3  schema_audit             ref src/schemas/check_schema_validation.py

Where the reference fans out with multiprocessing pools + async HTTP
(SURVEY §3 EP1 steps 4-5), these plans fan out with executor
parallelism; where it LRU-caches point lookups, these broadcast-join.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.filter_dsl import Filter, compile_filter
from .operators.merge import keep_latest, merge_classify
from .operators.morphology import morphology_flags
from .operators.voxel import lookup_regions


def _exists_label(col: str, label: str):
    return F.exists(F.col(col), lambda a: a["hasBody"]["label"] == label)


def trace_audit(resources: DataFrame, curated: bool | None = None) -> DataFrame:
    """EP1: per-resource quality-check battery -> one row per resource
    with named boolean check columns + an ``errors`` array of failed
    check names (the reference's per-bucket error report reduces off
    this with groupBy(bucket).collect_list).

    ``curated``: True -> only curated resources, False -> only
    uncurated, None -> all (the reference's curated/uncurated/both CLI
    switch, compiled to FILTER [NOT] EXISTS — validation.py:405-411).
    """
    df = resources.filter(~F.col("_deprecated"))
    if curated is True:
        df = df.filter(compile_filter(df, Filter("eq", ["annotation", "hasBody", "label"], "Curated")))
    elif curated is False:
        df = df.filter(compile_filter(df, Filter("ne", ["annotation", "hasBody", "label"], "Curated")))

    checks = {
        # MINDS completeness (validation.py:90-91): required top fields
        "has_description": F.col("description").isNotNull()
        & (F.length("description") > 0),
        "has_subject": F.col("subject").isNotNull(),
        "has_distribution": F.size(F.coalesce(F.col("distribution"), F.array()))
        > 0,
        # distribution selection (validation.py:103-125): an .nwb asset
        "has_nwb": F.exists(
            F.coalesce(F.col("distribution"), F.array()),
            lambda d: F.element_at(F.split(d["name"], r"\."), -1) == "nwb",
        ),
        # every distribution row carries a retrievable contentUrl
        "urls_ok": F.forall(
            F.coalesce(F.col("distribution"), F.array()),
            lambda d: d["contentUrl"].isNotNull(),
        ),
    }
    out = df.select("id", "bucket", *[c.alias(n) for n, c in checks.items()])
    failed = F.filter(
        F.array(
            *[
                F.when(~F.col(n), F.lit(n)).otherwise(F.lit(None))
                for n in checks
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return out.withColumn("errors", failed).withColumn(
        "passed", F.size("errors") == 0
    )


def bucket_error_report(audit: DataFrame) -> DataFrame:
    """EP1 reduce: per-bucket failure rollup (validation.py:424-441)."""
    return (
        audit.select("bucket", F.explode_outer("errors").alias("error"))
        .groupBy("bucket")
        .agg(
            F.count(F.col("error")).alias("n_errors"),
            F.sort_array(F.collect_set("error")).alias("distinct_errors"),
        )
    )


def morphology_quality(
    points: DataFrame,
    existing_annotations: DataFrame | None = None,
    volume: np.ndarray | None = None,
    affine: np.ndarray | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """EP2: per-file quality metrics (+ optional soma-region voxel
    lookup), then classify the computed annotation rows against the
    existing ones (keep-latest + full-outer merge -> create/update/
    keep/deprecate) for the upsert sink.

    Returns (report, merge_plan) — merge_plan is None when no existing
    annotations are supplied."""
    report = morphology_flags(points)
    if volume is not None and affine is not None:
        soma = points.filter((F.col("parent") < 0)).select("file", "x", "y", "z")
        regions = lookup_regions(soma, volume, affine).select(
            "file", F.col("region_id").alias("soma_region_id")
        )
        report = report.join(regions, "file", "left")

    if existing_annotations is None:
        return report, None
    computed = report.select(
        F.col("file").alias("target_id"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("total_length"),
    )
    latest = keep_latest(existing_annotations, ["target_id"], "_createdAt")
    plan = merge_classify(
        latest, computed, ["target_id"], ["n_points", "total_length"]
    )
    return report, plan


def schema_audit(resources: DataFrame, schema_map: DataFrame) -> DataFrame:
    """EP3: per-(bucket, type) census with constraint accounting —
    total, deprecated, unconstrained, and constrained-by-the-wrong-
    schema counts (getters.py:64-112 + check_schema_validation.py).
    ``schema_map``: (type, schema) expected binding, broadcast."""
    joined = resources.join(F.broadcast(schema_map), "type", "left")
    return (
        joined.groupBy("bucket", "type")
        .agg(
            F.count("*").alias("n_resources"),
            F.count(F.when(F.col("_deprecated"), 1)).alias("n_deprecated"),
            F.count(
                F.when(
                    F.col("_constrainedBy").isNull()
                    | (F.col("_constrainedBy") == "unconstrained"),
                    1,
                )
            ).alias("n_unconstrained"),
            F.count(
                F.when(
                    F.col("schema").isNotNull()
                    & F.col("_constrainedBy").isNotNull()
                    & (F.col("_constrainedBy") != "unconstrained")
                    & (F.col("_constrainedBy") != F.col("schema")),
                    1,
                )
            ).alias("n_wrong_schema"),
        )
        .orderBy("bucket", "type")
    )
