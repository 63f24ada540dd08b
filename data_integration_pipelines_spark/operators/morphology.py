"""Morphology validation kernels (SURVEY §2.9) over the ``swc_points``
table ``(file, n, type, x, y, z, radius, parent)``.

Two tiers, mirroring SURVEY §7.1 Phase 3's dependency-light plan:

1. **Relational battery** (`segment_table`, `morphology_flags`):
   geometric checks that are pure joins/aggregations — zero radii,
   zero-length segments, z-jumps, multifurcations (child counts),
   dangling roots, neurite-type presence. These re-express
   ref src/neuron_morphology/validation/validator.py:147-340 checks
   as Column exprs: distributed, codegen'd, no Python.
2. **Per-tree traversal kernel** (`tree_metrics`): metrics needing
   root-to-leaf path accumulation — path length from soma, connected
   components, max branch order, heterogeneous neurites near soma
   (40 um rule, ref src/neuron_morphology/validation/
   custom_validation.py:11-29) — via ``applyInPandas`` per file
   (numpy inside; one file = one group, bounded memory: largest
   reference SWC is ~75k points).

SWC type codes: 1=soma 2=axon 3=basal 4=apical
(ref src/neuron_morphology/section_type_labels.py:5-18).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import e4
from .cache import bounded_persist

SOMA, AXON, BASAL, APICAL = 1, 2, 3, 4

Z_JUMP_THRESHOLD = 10.0  # um, jump relative to parent
ROOT_JUMP_THRESHOLD = 10.0  # um, neurite root distance from soma attachment
NARROW_START_FRAC = 0.9  # ref validator.py:196-207
FAT_END_FACTOR = 1.5
# radical diameter change between consecutive points: child radius
# jumping past FACTOR x (or below 1/FACTOR x) the parent radius
# (ref custom_validation.py radical diameter changes)
RADICAL_DIAMETER_FACTOR = 2.0
FLAT_TOL = 1e-6  # ref validator.py:269-277 flat-neurite tolerance
HETERO_PATH_UM = 40.0  # ref custom_validation.py:11-29


def segment_table(points: DataFrame) -> DataFrame:
    """(file, n, type, child radius/coords, parent coords, seg_len):
    child->parent equi-join within file (the tree-as-table join)."""
    child = points.alias("c")
    parent = points.select(
        F.col("file").alias("file_p"),
        F.col("n").alias("pn"),
        F.col("type").alias("ptype"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.col("z").alias("pz"),
        F.col("radius").alias("pradius"),
    )
    seg = child.join(
        parent,
        (F.col("c.file") == F.col("file_p")) & (F.col("c.parent") == F.col("pn")),
    )
    # explicit multiplication, not **2/pow: IEEE multiply is exactly
    # specified so Spark and any oracle engine produce bit-identical
    # doubles, while JVM Math.pow vs libm pow can differ by 1 ulp —
    # enough to flip a round() boundary at larger SF
    _dx = F.col("c.x") - F.col("px")
    _dy = F.col("c.y") - F.col("py")
    _dz = F.col("c.z") - F.col("pz")
    dist = F.sqrt(
        _dx * _dx
        + _dy * _dy
        + _dz * _dz
    )
    return seg.select(
        F.col("c.file").alias("file"),
        F.col("c.n").alias("n"),
        F.col("c.type").alias("type"),
        F.col("c.radius").alias("radius"),
        F.col("c.z").alias("z"),
        "ptype",
        "pradius",
        "pz",
        dist.alias("seg_len"),
    )


def morphology_flags(points: DataFrame) -> DataFrame:
    """Per-file relational check battery. One row per file with count/
    boolean columns named after the reference checks.

    ``points`` feeds three consumers (per-point aggregate, the segment
    self-join's two sides, child-count aggregate). Without a barrier
    each consumer prunes a different column set, the subtrees stop
    being identical, exchange reuse never fires, and the plan pays one
    scan + one file-keyed shuffle PER CONSUMER. Persisting once keeps
    a single scan and a single partitioning that every downstream
    file-keyed agg/join inherits — the difference between 1 and 3
    full-input shuffles at 100 TB."""
    points = bounded_persist(points)
    segs = segment_table(points)

    child_counts = (
        points.filter(F.col("parent") >= 0)
        .groupBy("file", F.col("parent").alias("n"))
        .agg(F.count("*").alias("n_children"))
    )

    per_point = points.groupBy("file").agg(
        F.count("*").alias("n_points"),
        F.sum(F.when(F.col("parent") < 0, 1).otherwise(0)).alias("n_roots"),
        F.sum(F.when((F.col("type") == SOMA) & (F.col("radius") <= 0), 1).otherwise(0)).alias(
            "n_zero_soma_radius"
        ),
        F.sum(F.when((F.col("type") != SOMA) & (F.col("radius") <= 0), 1).otherwise(0)).alias(
            "n_zero_radius"
        ),
        F.countDistinct("radius").alias("n_distinct_radii"),
        F.max(F.when(F.col("type") == SOMA, F.col("radius"))).alias("soma_radius"),
        F.sum(F.when(F.col("type") == AXON, 1).otherwise(0)).alias("n_axon_points"),
        F.sum(F.when(F.col("type") == BASAL, 1).otherwise(0)).alias("n_basal_points"),
        F.sum(F.when(F.col("type") == APICAL, 1).otherwise(0)).alias("n_apical_points"),
        F.sum(F.when((F.col("type") != SOMA) & (F.col("parent") < 0), 1).otherwise(0)).alias(
            "n_dangling_roots"
        ),
    )

    per_seg = segs.groupBy("file").agg(
        F.sum(F.when(F.col("seg_len") <= 0, 1).otherwise(0)).alias("n_zero_len_segments"),
        F.sum(
            F.when(
                (F.col("type") != SOMA) & (F.abs(F.col("z") - F.col("pz")) > Z_JUMP_THRESHOLD),
                1,
            ).otherwise(0)
        ).alias("n_z_jumps"),
        # neurite roots = segments whose parent is soma but child is not
        F.sum(
            F.when(
                (F.col("ptype") == SOMA)
                & (F.col("type") != SOMA)
                & (F.col("seg_len") > ROOT_JUMP_THRESHOLD),
                1,
            ).otherwise(0)
        ).alias("n_root_jumps"),
        F.sum(
            F.when(
                (F.col("ptype") == SOMA)
                & (F.col("type") != SOMA)
                & (F.col("radius") < NARROW_START_FRAC * F.col("pradius")),
                1,
            ).otherwise(0)
        ).alias("n_narrow_starts"),
        # neurite stems (ref custom_validation.py #axons / #dendritic
        # trees): segments leaving the soma, counted by child type
        F.sum(
            F.when((F.col("ptype") == SOMA) & (F.col("type") == AXON), 1).otherwise(0)
        ).alias("n_axon_trees"),
        F.sum(
            F.when(
                (F.col("ptype") == SOMA) & F.col("type").isin(BASAL, APICAL), 1
            ).otherwise(0)
        ).alias("n_dendritic_trees"),
        # radical diameter change along a segment (both ends non-soma)
        F.sum(
            F.when(
                (F.col("type") != SOMA)
                & (F.col("ptype") != SOMA)
                & (
                    (F.col("radius") >= RADICAL_DIAMETER_FACTOR * F.col("pradius"))
                    | (F.col("radius") * RADICAL_DIAMETER_FACTOR <= F.col("pradius"))
                ),
                1,
            ).otherwise(0)
        ).alias("n_radical_diameter_changes"),
        # order-independent total: quantize each segment to 1e-4 units
        # and sum EXACT integers. Float SUM is order-dependent (partition
        # count, merge order), so round(sum(double)) can flip a .xx5
        # boundary between engines/runs; integer sums are associative and
        # bit-identical everywhere.
        F.sum(F.floor(F.col("seg_len") * 1e4 + F.lit(0.5)).cast("bigint")).alias(
            "total_length_e4"
        ),
        e4(F.max("seg_len")).alias("max_seg_len_e4"),
        F.round(F.avg(F.when(F.col("type") != SOMA, F.col("radius"))), 4).alias(
            "mean_neurite_radius"
        ),
    ).withColumn("total_length", F.col("total_length_e4") / F.lit(1e4))

    # flat neurites (ref validator.py:269-277, tol 1e-6): a neurite
    # type whose points collapse onto a plane — some axis has ~zero
    # extent. Recast per (file, type != soma): pure min/max aggregates.
    flat = (
        points.filter(F.col("type") != SOMA)
        .groupBy("file", "type")
        .agg(
            (F.max("x") - F.min("x")).alias("ex"),
            (F.max("y") - F.min("y")).alias("ey"),
            (F.max("z") - F.min("z")).alias("ez"),
        )
        .groupBy("file")
        .agg(
            F.sum(
                F.when(
                    F.least("ex", "ey", "ez") <= FLAT_TOL, 1
                ).otherwise(0)
            ).alias("n_flat_neurite_types")
        )
    )

    # soma stems are not bifurcations: only non-soma nodes with >=3
    # children count (ref validator.py:289-297 multifurcation semantics)
    multifurcations = (
        child_counts.join(points.select("file", "n", "type"), ["file", "n"])
        .groupBy("file")
        .agg(
            F.sum(
                F.when((F.col("n_children") >= 3) & (F.col("type") != SOMA), 1).otherwise(0)
            ).alias("n_multifurcations")
        )
    )

    # leaves = points with no children; fat end = leaf radius >> mean neurite radius
    leaves = (
        points.alias("p")
        .join(
            child_counts.withColumnRenamed("n_children", "cc"),
            ["file", "n"],
            "left",
        )
        .filter(F.col("cc").isNull() & (F.col("type") != SOMA))
        .select("file", F.col("radius").alias("leaf_radius"))
    )
    fat = (
        leaves.join(per_seg.select("file", "mean_neurite_radius"), "file")
        .groupBy("file")
        .agg(
            F.sum(
                F.when(
                    F.col("leaf_radius") > FAT_END_FACTOR * F.col("mean_neurite_radius"), 1
                ).otherwise(0)
            ).alias("n_fat_ends")
        )
    )

    out = (
        per_point.join(per_seg, "file", "left")
        .join(multifurcations, "file", "left")
        .join(fat, "file", "left")
        .join(flat, "file", "left")
        .fillna(
            0,
            subset=[
                "n_flat_neurite_types",
                "n_zero_len_segments",
                "n_z_jumps",
                "n_root_jumps",
                "n_narrow_starts",
                "n_multifurcations",
                "n_fat_ends",
                "n_axon_trees",
                "n_dendritic_trees",
                "n_radical_diameter_changes",
            ],
        )
    )
    return out.withColumns(
        {
            "has_different_diameters": F.col("n_distinct_radii") >= 2,  # validator.py:147-157
            "has_axon": F.col("n_axon_points") > 0,  # validator.py:330-340
            "has_basal_dendrite": F.col("n_basal_points") > 0,  # validator.py:311-328
            "has_apical_dendrite": F.col("n_apical_points") > 0,
            "has_dangling_branch": F.col("n_dangling_roots") > 0,  # validator.py:158-169
            "has_multiple_components": F.col("n_roots") > 1,
        }
    )


_TREE_SCHEMA = (
    "file string, n_components int, max_branch_order int, "
    "max_path_length double, n_hetero_near_soma int, n_type_changes int"
)


def _tree_metrics_one(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver for one file: iterative parent-pointer traversal (numpy-
    light; files are <=100k points). Computes connected components,
    branch order, path length from root, and heterogeneous-neurite
    type changes within HETERO_PATH_UM of the soma."""
    f = pdf["file"].iloc[0]
    idx = {int(r.n): i for i, r in enumerate(pdf.itertuples())}
    parents = pdf["parent"].astype(int).tolist()
    xs, ys, zs = pdf["x"].tolist(), pdf["y"].tolist(), pdf["z"].tolist()
    types = pdf["type"].astype(int).tolist()

    children: dict[int, list[int]] = {}
    roots = []
    for i, p in enumerate(parents):
        if p < 0 or p not in idx:
            roots.append(i)
        else:
            children.setdefault(idx[p], []).append(i)

    path_len = [0.0] * len(parents)
    branch_order = [0] * len(parents)
    comp = [-1] * len(parents)
    n_hetero = 0
    n_type_changes = 0
    for ci, root in enumerate(roots):
        stack = [root]
        comp[root] = ci
        while stack:
            node = stack.pop()
            for ch in children.get(node, ()):
                comp[ch] = ci
                d = math.dist(
                    (xs[node], ys[node], zs[node]), (xs[ch], ys[ch], zs[ch])
                )
                path_len[ch] = path_len[node] + d
                is_branch = len(children.get(node, ())) >= 2
                branch_order[ch] = branch_order[node] + (1 if is_branch else 0)
                if types[ch] != types[node] and types[node] != SOMA:
                    n_type_changes += 1
                    if path_len[ch] <= HETERO_PATH_UM:
                        n_hetero += 1
                stack.append(ch)

    return pd.DataFrame(
        [
            {
                "file": f,
                "n_components": len(roots),
                "max_branch_order": max(branch_order) if branch_order else 0,
                "max_path_length": round(max(path_len), 4) if path_len else 0.0,
                "n_hetero_near_soma": n_hetero,
                "n_type_changes": n_type_changes,
            }
        ]
    )


def tree_metrics(points: DataFrame) -> DataFrame:
    """Per-file tree-traversal metrics via ``applyInPandas`` (one group
    per file). The running path-length accumulation is W2
    (ref custom_validation.py:11-29) — a parent-pointer recursion, not
    a frame window, hence the per-tree kernel."""
    return points.groupBy("file").applyInPandas(_tree_metrics_one, schema=_TREE_SCHEMA)


def quality_report(points: DataFrame) -> DataFrame:
    """Full per-file check matrix (flags + tree metrics) — the TSV
    report shape of ref src/neuron_morphology/validation/
    quality_metric.py:99-125."""
    return morphology_flags(points).join(tree_metrics(points), "file", "left")
