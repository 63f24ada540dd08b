"""Upsert / merge semantics (S17, J6, W1).

The reference's write-back loop: search existing resources by key,
update matched ones (carrying store metadata, bumping ``_rev``),
register unmatched ones, deprecate stale duplicates
(ref src/neuron_morphology/validation/quality_metric_resource.py:107-135,
src/neuron_morphology/feature_annotations/create_update_annotations.py:110-142).

Spark-first: a full-outer join classifies rows into
create/update/keep/deprecate; ``keep_latest`` collapses duplicate
existing rows first (window dedup). On a lakehouse this is exactly a
Delta ``MERGE INTO`` — the classification below is engine-agnostic and
feeds either a MERGE or a partition-overwrite writer.

Scale notes: the join shuffles both sides on the merge key — correct
and unavoidable for a general merge; when the computed side is small
(typical annotation batches) Spark broadcasts it automatically under
AQE. Skewed merge keys are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def keep_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One survivor per key: max ``order_col`` (ref W1 keep-latest dedup)."""
    order = [F.desc(order_col)] + [F.desc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_classify(
    existing: DataFrame,
    computed: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Full-outer-join merge classification.

    Returns key columns + ``action`` in
    {'create', 'update', 'keep', 'deprecate'}:
    create = computed only; deprecate = existing only;
    update = both sides present but any compare column differs;
    keep = both present and identical.
    """
    ex = existing.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"__ex_{c}") for c in compare_cols],
        F.lit(True).alias("__ex_present"),
    )
    co = computed.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"__co_{c}") for c in compare_cols],
        F.lit(True).alias("__co_present"),
    )
    joined = ex.join(co, on=list(key_cols), how="full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        # null-safe inequality
        differs = differs | ~F.col(f"__ex_{c}").eqNullSafe(F.col(f"__co_{c}"))
    action = (
        F.when(F.col("__ex_present").isNull(), "create")
        .when(F.col("__co_present").isNull(), "deprecate")
        .when(differs, "update")
        .otherwise("keep")
    )
    return joined.select(*key_cols, action.alias("action"))


def apply_merge(
    existing: DataFrame,
    computed: DataFrame,
    key_cols: Sequence[str],
    rev_col: str = "_rev",
) -> DataFrame:
    """Materialized merge result: computed rows win, ``_rev`` bumped
    only when a value column actually changed (null-safe compare —
    matching the reference's update-only-on-change write-back),
    existing-only rows kept with ``_deprecated`` set (S17).

    Presence of a computed row is tracked with an explicit ``__co``
    flag, never value-column nullness: a computed row whose values are
    all NULL still upserts (it is a real row carrying NULLs)."""
    value_cols = [c for c in computed.columns if c not in key_cols]
    cmp_cols = [c for c in value_cols if c in existing.columns]
    co = computed.select(*key_cols, *value_cols, F.lit(True).alias("__co"))
    ex = existing.select(
        *key_cols,
        *[F.col(c).alias(f"__ex_{c}") for c in cmp_cols],
        F.col(rev_col).alias("__old_rev"),
        F.lit(True).alias("__ex"),
    )
    merged = co.join(ex, on=list(key_cols), how="full_outer")
    if cmp_cols:
        changed = F.lit(False)
        for c in cmp_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.col(f"__ex_{c}"))
    else:
        # no comparable columns -> any match counts as an update
        changed = F.lit(True)
    new_rev = (
        F.when(F.col("__ex").isNull(), F.lit(1))
        .when(changed, F.col("__old_rev") + 1)
        .otherwise(F.col("__old_rev"))
    )
    upserts = (
        merged.filter(F.col("__co").isNotNull())
        .withColumn(rev_col, new_rev)
        .withColumn("_deprecated", F.lit(False))
        .drop("__old_rev", "__co", "__ex", *[f"__ex_{c}" for c in cmp_cols])
    )
    dep_keys = existing.join(computed.select(*key_cols), on=list(key_cols), how="left_anti")
    deprecated = dep_keys.withColumn("_deprecated", F.lit(True))
    common = [c for c in upserts.columns if c in deprecated.columns]
    return upserts.select(*common).unionByName(deprecated.select(*common))
