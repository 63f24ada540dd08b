"""Driver-gate coverage for the morphology kernels (SURVEY §2.9, A4-A6):
a deterministic ``swc_points``-shaped table is synthesized from
``lineitem`` (chain topology per file), then the REAL operators run on
it — ``morphology_flags`` (relational battery) and ``tree_metrics``
(applyInPandas traversal kernel) — both checked against SQL oracles
that re-derive the same numbers arithmetically.

This mirrors the reference's differential-testing habit (SURVEY §5
item 3): one computation, two independent engines, exact match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.quantize import e4_sql, quantized, quantized_sql
from ..operators.morphology import morphology_flags, tree_metrics
from .base import REGISTRY, register

# Shared synthesis: one "file" per (l_orderkey % 50), points numbered
# in (l_orderkey, l_linenumber) order; type 1 (soma) for point 1, then
# 2/3/4 from the part key; coordinates/radii from line measures.
# TOPOLOGY (round 3): a TWO-component binary branching forest, not a
# chain — parent(1) = parent(2) = -1 (two roots), parent(n) = n/2 for
# n >= 3, so most internal nodes have two children and branch order /
# component count are non-trivial. The tree-metrics oracle re-derives
# them with a recursive-CTE parent walk, certifying the applyInPandas
# kernel's branching logic differentially (not just on chains).
_SYNTH_SQL = """
    pts AS (
        SELECT file, n,
               CASE WHEN n = 1 THEN 1 ELSE 2 + pk % 3 END AS type,
               x, y, z, radius,
               CASE WHEN n <= 2 THEN -1 ELSE n // 2 END AS parent
        FROM (
            SELECT 'f' || CAST(l_orderkey % 50 AS VARCHAR) AS file,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY l_orderkey % 50
                        ORDER BY l_orderkey, l_linenumber) AS INT) AS n,
                   l_partkey AS pk,
                   l_quantity AS x,
                   l_discount * 100 AS y,
                   l_tax * 1000 AS z,
                   ROUND(l_extendedprice % 10, 2) AS radius
            FROM lineitem WHERE l_orderkey < 300
        )
    )
"""


def synth_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    # Materialize the file key as a COLUMN first, then window on that
    # attribute: if the window keys on the raw concat expression it
    # becomes an internal `_w0` attribute, and the downstream
    # groupBy("file") (applyInPandas tree walk) can no longer reuse the
    # exchange — the plan paid TWO hash shuffles on the same value
    # until round 3. One attribute -> one exchange, reused.
    file_key = F.concat(F.lit("f"), (F.col("l_orderkey") % 50).cast("string"))
    li = li.withColumn("file", file_key)
    w = Window.partitionBy("file").orderBy("l_orderkey", "l_linenumber")
    base = li.select(
        "file",
        F.row_number().over(w).alias("n"),
        F.col("l_partkey").alias("pk"),
        F.col("l_quantity").alias("x"),
        (F.col("l_discount") * 100).alias("y"),
        (F.col("l_tax") * 1000).alias("z"),
        F.round(F.col("l_extendedprice") % 10, 2).alias("radius"),
    )
    return base.select(
        "file",
        "n",
        F.when(F.col("n") == 1, 1).otherwise(2 + F.col("pk") % 3).cast("int").alias("type"),
        "x",
        "y",
        "z",
        "radius",
        F.when(F.col("n") <= 2, -1)
        .otherwise(F.floor(F.col("n") / 2))
        .cast("int")
        .alias("parent"),
    )


@register(
    "morphology_battery",
    f"""
    WITH {_SYNTH_SQL},
    segs AS (
        SELECT c.file, c.n, c.type, c.radius, c.z,
               p.type AS ptype, p.z AS pz, p.radius AS pradius,
               SQRT((c.x - p.x)*(c.x - p.x) + (c.y - p.y)*(c.y - p.y) + (c.z - p.z)*(c.z - p.z)) AS seg_len
        FROM pts c JOIN pts p ON c.file = p.file AND c.parent = p.n
    ),
    per_point AS (
        SELECT file,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN parent < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_roots,
               CAST(SUM(CASE WHEN type <> 1 AND radius <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_radius,
               CAST(COUNT(DISTINCT radius) AS BIGINT) AS n_distinct_radii,
               SUM(CASE WHEN type = 2 THEN 1 ELSE 0 END) > 0 AS has_axon,
               SUM(CASE WHEN type = 3 THEN 1 ELSE 0 END) > 0 AS has_basal_dendrite
        FROM pts GROUP BY file
    ),
    per_seg AS (
        SELECT file,
               CAST(SUM(CASE WHEN seg_len <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_len_segments,
               CAST(SUM(CASE WHEN type <> 1 AND ABS(z - pz) > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_z_jumps,
               CAST(SUM(CASE WHEN ptype = 1 AND type = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_axon_trees,
               CAST(SUM(CASE WHEN ptype = 1 AND type IN (3, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_dendritic_trees,
               CAST(SUM(CASE WHEN type <> 1 AND ptype <> 1
                             AND (radius >= 2.0 * pradius OR radius * 2.0 <= pradius)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_radical_diameter_changes,
               ((CAST(SUM(CAST(FLOOR(seg_len * 10000 + 0.5) AS BIGINT)) AS BIGINT) + 50) // 100) / 100.0 AS total_length,
               {e4_sql('MAX(seg_len)')} AS max_seg_len_e4
        FROM segs GROUP BY file
    )
    SELECT p.file, n_points, n_roots, n_zero_radius, n_distinct_radii,
           has_axon, has_basal_dendrite,
           n_zero_len_segments, n_z_jumps, n_axon_trees, n_dendritic_trees,
           n_radical_diameter_changes, total_length, max_seg_len_e4
    FROM per_point p JOIN per_seg s ON p.file = s.file
    ORDER BY p.file
    """,
    headline=True,
    doc="Morphology relational check battery (§2.9 geometric checks as Column "
    "exprs; A6 scalar metric aggregates) on a synthesized points table, "
    "running the real operators/morphology.morphology_flags code path.",
)
def morphology_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = morphology_flags(synth_points(spark, sf_dir))
    return flags.select(
        "file",
        "n_points",
        "n_roots",
        F.col("n_zero_radius").cast("bigint").alias("n_zero_radius"),
        "n_distinct_radii",
        "has_axon",
        "has_basal_dendrite",
        F.col("n_zero_len_segments").cast("bigint").alias("n_zero_len_segments"),
        F.col("n_z_jumps").cast("bigint").alias("n_z_jumps"),
        F.col("n_axon_trees").cast("bigint").alias("n_axon_trees"),
        F.col("n_dendritic_trees").cast("bigint").alias("n_dendritic_trees"),
        F.col("n_radical_diameter_changes")
        .cast("bigint")
        .alias("n_radical_diameter_changes"),
        # round-to-2 in exact integer space (mirrors the oracle's
        # (e4 + 50) // 100: same integers -> same double on both engines)
        (F.expr("(total_length_e4 + 50) div 100") / F.lit(100.0)).alias(
            "total_length"
        ),
        F.col("max_seg_len_e4").alias("max_seg_len_e4"),
    ).orderBy("file")


# The reference's two canonical ASC defect fixtures (inline literals at
# src/neuron_morphology/validation/load_test_data.py:37-75 — the
# unifurcation/multifurcation cases validator.py:286,295 exercises).
_ASC_UNIFURCATION = """
((CellBody) (-1 0 0 2) (1 0 0 2))

 ((Dendrite)
  (0 0 0 2)
  (0 5 0 2)
  (
   (-5 5 0 3)
   (
    (-10 5 0 3)
   )
   |
   (6 5 0 3)
   )
  )
"""

_ASC_MULTIFURCATION = """
((CellBody) (-1 0 0 2) (1 0 0 2))
( (Color Blue)
  (Axon)
  (0 5 0 2)
  (2 9 0 2)
  (0 13 0 2)
  (
    (0 13 0 2)
    (4 13 0 2)
    |
    (0 13 0 2)
    (4 13 0 2)
    |
    (0 13 0 2)
    (4 13 0 2)
    |
    (0 13 0 2)
    (4 13 0 2)
  )
)
"""

# Hand-derived expected parse of the fixtures above (n, type, x, y, z,
# radius=diameter/2, parent; each top-level form roots at -1). The
# oracle battery is computed from THESE rows — if the distributed
# parser deviates from the grammar, the hash mismatches.
_ASC_EXPECTED_POINTS = """
    pts(file, n, type, x, y, z, radius, parent) AS (VALUES
        ('multi', 1, 1, -1.0, 0.0, 0.0, 1.0, -1),
        ('multi', 2, 1, 1.0, 0.0, 0.0, 1.0, 1),
        ('multi', 3, 2, 0.0, 5.0, 0.0, 1.0, -1),
        ('multi', 4, 2, 2.0, 9.0, 0.0, 1.0, 3),
        ('multi', 5, 2, 0.0, 13.0, 0.0, 1.0, 4),
        ('multi', 6, 2, 0.0, 13.0, 0.0, 1.0, 5),
        ('multi', 7, 2, 4.0, 13.0, 0.0, 1.0, 6),
        ('multi', 8, 2, 0.0, 13.0, 0.0, 1.0, 5),
        ('multi', 9, 2, 4.0, 13.0, 0.0, 1.0, 8),
        ('multi', 10, 2, 0.0, 13.0, 0.0, 1.0, 5),
        ('multi', 11, 2, 4.0, 13.0, 0.0, 1.0, 10),
        ('multi', 12, 2, 0.0, 13.0, 0.0, 1.0, 5),
        ('multi', 13, 2, 4.0, 13.0, 0.0, 1.0, 12),
        ('uni', 1, 1, -1.0, 0.0, 0.0, 1.0, -1),
        ('uni', 2, 1, 1.0, 0.0, 0.0, 1.0, 1),
        ('uni', 3, 3, 0.0, 0.0, 0.0, 1.0, -1),
        ('uni', 4, 3, 0.0, 5.0, 0.0, 1.0, 3),
        ('uni', 5, 3, -5.0, 5.0, 0.0, 1.5, 4),
        ('uni', 6, 3, -10.0, 5.0, 0.0, 1.5, 5),
        ('uni', 7, 3, 6.0, 5.0, 0.0, 1.5, 4))
"""


@register(
    "asc_morphology_battery",
    f"""
    WITH {_ASC_EXPECTED_POINTS},
    segs AS (
        SELECT c.file, c.n, c.type, c.radius, c.z,
               p.type AS ptype, p.z AS pz, p.radius AS pradius,
               SQRT((c.x - p.x)*(c.x - p.x) + (c.y - p.y)*(c.y - p.y) + (c.z - p.z)*(c.z - p.z)) AS seg_len
        FROM pts c JOIN pts p ON c.file = p.file AND c.parent = p.n
    ),
    per_point AS (
        SELECT file,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN parent < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_roots,
               CAST(SUM(CASE WHEN type <> 1 AND radius <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_radius,
               CAST(COUNT(DISTINCT radius) AS BIGINT) AS n_distinct_radii,
               SUM(CASE WHEN type = 2 THEN 1 ELSE 0 END) > 0 AS has_axon,
               SUM(CASE WHEN type = 3 THEN 1 ELSE 0 END) > 0 AS has_basal_dendrite
        FROM pts GROUP BY file
    ),
    per_seg AS (
        SELECT file,
               CAST(SUM(CASE WHEN seg_len <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_len_segments,
               CAST(SUM(CASE WHEN type <> 1 AND ABS(z - pz) > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_z_jumps,
               CAST(SUM(CASE WHEN ptype = 1 AND type = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_axon_trees,
               CAST(SUM(CASE WHEN ptype = 1 AND type IN (3, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_dendritic_trees,
               CAST(SUM(CASE WHEN type <> 1 AND ptype <> 1
                             AND (radius >= 2.0 * pradius OR radius * 2.0 <= pradius)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_radical_diameter_changes,
               ((CAST(SUM(CAST(FLOOR(seg_len * 10000 + 0.5) AS BIGINT)) AS BIGINT) + 50) // 100) / 100.0 AS total_length,
               {e4_sql('MAX(seg_len)')} AS max_seg_len_e4
        FROM segs GROUP BY file
    )
    SELECT p.file, n_points, n_roots, n_zero_radius, n_distinct_radii,
           has_axon, has_basal_dendrite,
           n_zero_len_segments, n_z_jumps, n_axon_trees, n_dendritic_trees,
           n_radical_diameter_changes, total_length, max_seg_len_e4
    FROM per_point p JOIN per_seg s ON p.file = s.file
    ORDER BY p.file
    """,
    doc="S9 ASC/Neurolucida source: the reference's inline unifurcation/"
    "multifurcation ASC fixtures (load_test_data.py:37-75) parsed by the "
    "distributed s-expression parser (sources/asc.py), then the SAME "
    "morphology battery as the SWC path; the oracle re-derives the battery "
    "from a hand-parsed VALUES table, so parser drift hash-mismatches.",
)
def asc_morphology_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.asc import parse_asc_frame

    import pandas as pd

    from ..catalog import rightsize_session

    rightsize_session(spark)
    # pandas+Arrow createDataFrame: the scan stays JVM-side. The
    # pickled-rows form compiles to a PythonRDD whose scan spawns one
    # Python worker per partition (defaultParallelism of them, 31
    # empty) — measured 4 s cold on a vanilla local[32] session.
    # repartition(1) then keeps the tiny fixture in one task downstream.
    fixtures = spark.createDataFrame(
        pd.DataFrame(
            [("uni", _ASC_UNIFURCATION), ("multi", _ASC_MULTIFURCATION)],
            columns=["file", "text"],
        )
    ).repartition(1)
    flags = morphology_flags(parse_asc_frame(fixtures))
    return flags.select(
        "file",
        "n_points",
        "n_roots",
        F.col("n_zero_radius").cast("bigint").alias("n_zero_radius"),
        "n_distinct_radii",
        "has_axon",
        "has_basal_dendrite",
        F.col("n_zero_len_segments").cast("bigint").alias("n_zero_len_segments"),
        F.col("n_z_jumps").cast("bigint").alias("n_z_jumps"),
        F.col("n_axon_trees").cast("bigint").alias("n_axon_trees"),
        F.col("n_dendritic_trees").cast("bigint").alias("n_dendritic_trees"),
        F.col("n_radical_diameter_changes")
        .cast("bigint")
        .alias("n_radical_diameter_changes"),
        # round-to-2 in exact integer space (mirrors the oracle's
        # (e4 + 50) // 100: same integers -> same double on both engines)
        (F.expr("(total_length_e4 + 50) div 100") / F.lit(100.0)).alias(
            "total_length"
        ),
        F.col("max_seg_len_e4").alias("max_seg_len_e4"),
    ).orderBy("file")


# H5 morphology fixtures (BBP/MorphIO v1 layout: points Nx4 =
# x,y,z,DIAMETER; structure Sx3 = first-point, type, parent-section).
# 'h5a': soma + axon trunk branching into two child sections; 'h5b':
# single-point soma + basal with a zero-length segment and a z-jump.
_H5_FIXTURES = {
    "h5a": (
        # points: x, y, z, diameter
        [(-1, 0, 0, 2), (1, 0, 0, 2),
         (0, 0, 0, 2), (0, 5, 0, 2), (0, 10, 0, 2),
         (-5, 10, 0, 3), (-10, 10, 0, 3),
         (5, 10, 0, 3), (10, 10, 0, 3)],
        # structure: start, type, parent section
        [(0, 1, -1), (2, 2, 0), (5, 2, 1), (7, 2, 1)],
    ),
    "h5b": (
        [(0, 0, 0, 2),
         (0, 0, 0, 1), (0, 0, 0, 1), (0, 0, 15, 1)],
        [(0, 1, -1), (1, 3, 0)],
    ),
}

# Hand-derived per-point parse of the fixtures above (per-point parents
# from the section layout: within-section chain, first point -> last
# point of the parent section; radius = diameter/2). The oracle battery
# re-derives from THESE rows, so source drift hash-mismatches.
_H5_EXPECTED_POINTS = """
    pts(file, n, type, x, y, z, radius, parent) AS (VALUES
        ('h5a', 1, 1, -1.0, 0.0, 0.0, 1.0, -1),
        ('h5a', 2, 1, 1.0, 0.0, 0.0, 1.0, 1),
        ('h5a', 3, 2, 0.0, 0.0, 0.0, 1.0, 2),
        ('h5a', 4, 2, 0.0, 5.0, 0.0, 1.0, 3),
        ('h5a', 5, 2, 0.0, 10.0, 0.0, 1.0, 4),
        ('h5a', 6, 2, -5.0, 10.0, 0.0, 1.5, 5),
        ('h5a', 7, 2, -10.0, 10.0, 0.0, 1.5, 6),
        ('h5a', 8, 2, 5.0, 10.0, 0.0, 1.5, 5),
        ('h5a', 9, 2, 10.0, 10.0, 0.0, 1.5, 8),
        ('h5b', 1, 1, 0.0, 0.0, 0.0, 1.0, -1),
        ('h5b', 2, 3, 0.0, 0.0, 0.0, 0.5, 1),
        ('h5b', 3, 3, 0.0, 0.0, 0.0, 0.5, 2),
        ('h5b', 4, 3, 0.0, 0.0, 15.0, 0.5, 3))
"""


@register(
    "h5_morphology_battery",
    f"""
    WITH {_H5_EXPECTED_POINTS},
    segs AS (
        SELECT c.file, c.n, c.type, c.radius, c.z,
               p.type AS ptype, p.z AS pz, p.radius AS pradius,
               SQRT((c.x - p.x)*(c.x - p.x) + (c.y - p.y)*(c.y - p.y) + (c.z - p.z)*(c.z - p.z)) AS seg_len
        FROM pts c JOIN pts p ON c.file = p.file AND c.parent = p.n
    ),
    per_point AS (
        SELECT file,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN parent < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_roots,
               CAST(SUM(CASE WHEN type <> 1 AND radius <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_radius,
               CAST(COUNT(DISTINCT radius) AS BIGINT) AS n_distinct_radii,
               SUM(CASE WHEN type = 2 THEN 1 ELSE 0 END) > 0 AS has_axon,
               SUM(CASE WHEN type = 3 THEN 1 ELSE 0 END) > 0 AS has_basal_dendrite
        FROM pts GROUP BY file
    ),
    per_seg AS (
        SELECT file,
               CAST(SUM(CASE WHEN seg_len <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_len_segments,
               CAST(SUM(CASE WHEN type <> 1 AND ABS(z - pz) > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_z_jumps,
               CAST(SUM(CASE WHEN ptype = 1 AND type = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_axon_trees,
               CAST(SUM(CASE WHEN ptype = 1 AND type IN (3, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_dendritic_trees,
               CAST(SUM(CASE WHEN type <> 1 AND ptype <> 1
                             AND (radius >= 2.0 * pradius OR radius * 2.0 <= pradius)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_radical_diameter_changes,
               ((CAST(SUM(CAST(FLOOR(seg_len * 10000 + 0.5) AS BIGINT)) AS BIGINT) + 50) // 100) / 100.0 AS total_length,
               {e4_sql('MAX(seg_len)')} AS max_seg_len_e4
        FROM segs GROUP BY file
    )
    SELECT p.file, n_points, n_roots, n_zero_radius, n_distinct_radii,
           has_axon, has_basal_dendrite,
           n_zero_len_segments, n_z_jumps, n_axon_trees, n_dendritic_trees,
           n_radical_diameter_changes, total_length, max_seg_len_e4
    FROM per_point p JOIN per_seg s ON p.file = s.file
    ORDER BY p.file
    """,
    doc="S9c H5 morphology source: fixtures serialized to REAL classic-"
    "HDF5 bytes (sources/hdf5_lite write path), parsed back by the "
    "distributed v1-layout reader (sources/h5_morph — points Nx4 + "
    "structure Sx3, per-point parents derived from sections; ref "
    "data/test_data/h5/v1 layout, morphio consumers in "
    "src/neuron_morphology), then the SAME battery as the SWC/ASC "
    "paths; the oracle re-derives from a hand-parsed VALUES table.",
)
def h5_morphology_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..sources.h5_morph import parse_h5_frame
    from ..sources.hdf5_lite import write_hdf5

    rows = [
        (
            name,
            bytearray(
                write_hdf5(
                    {
                        "points": np.asarray(pts, dtype=np.float64),
                        "structure": np.asarray(st, dtype=np.int64),
                    }
                )
            ),
        )
        for name, (pts, st) in _H5_FIXTURES.items()
    ]
    import pandas as pd

    from ..catalog import rightsize_session

    rightsize_session(spark)
    # pandas+Arrow build: JVM-side scan, no per-partition Python workers
    # (see asc_morphology_battery)
    fixtures = spark.createDataFrame(
        pd.DataFrame(rows, columns=["file", "content"])
    ).repartition(1)
    flags = morphology_flags(parse_h5_frame(fixtures))
    return flags.select(
        "file",
        "n_points",
        "n_roots",
        F.col("n_zero_radius").cast("bigint").alias("n_zero_radius"),
        "n_distinct_radii",
        "has_axon",
        "has_basal_dendrite",
        F.col("n_zero_len_segments").cast("bigint").alias("n_zero_len_segments"),
        F.col("n_z_jumps").cast("bigint").alias("n_z_jumps"),
        F.col("n_axon_trees").cast("bigint").alias("n_axon_trees"),
        F.col("n_dendritic_trees").cast("bigint").alias("n_dendritic_trees"),
        F.col("n_radical_diameter_changes")
        .cast("bigint")
        .alias("n_radical_diameter_changes"),
        (F.expr("(total_length_e4 + 50) div 100") / F.lit(100.0)).alias(
            "total_length"
        ),
        F.col("max_seg_len_e4").alias("max_seg_len_e4"),
    ).orderBy("file")


@register(
    "morphology_tree_metrics",
    f"""
    WITH RECURSIVE {_SYNTH_SQL},
    child_cnt AS (  -- branch point = node with >= 2 children
        SELECT p.file, p.n, COUNT(c.n) AS nch
        FROM pts p LEFT JOIN pts c ON c.file = p.file AND c.parent = p.n
        GROUP BY 1, 2
    ),
    walk(file, n, branch_order, path_len) AS (
        -- root-to-node parent walk: accumulates path length in the
        -- SAME order as the kernel (parent total + edge) and counts
        -- branch-point ancestors for the branch order
        SELECT file, n, 0, CAST(0.0 AS DOUBLE) FROM pts WHERE parent < 0
        UNION ALL
        SELECT c.file, c.n,
               w.branch_order + CASE WHEN cc.nch >= 2 THEN 1 ELSE 0 END,
               w.path_len + SQRT((c.x - p.x)*(c.x - p.x) + (c.y - p.y)*(c.y - p.y)
                                 + (c.z - p.z)*(c.z - p.z))
        FROM pts c
        JOIN walk w ON c.file = w.file AND c.parent = w.n
        JOIN pts p ON p.file = c.file AND p.n = c.parent
        JOIN child_cnt cc ON cc.file = p.file AND cc.n = p.n
    ),
    per_walk AS (
        SELECT file,
               CAST(MAX(branch_order) AS INT) AS max_branch_order,
               {quantized_sql('ROUND(MAX(path_len), 4)', 2)} AS max_path_length_x100
        FROM walk GROUP BY file
    ),
    comp AS (
        SELECT file, CAST(SUM(CASE WHEN parent < 0 THEN 1 ELSE 0 END) AS INT)
                   AS n_components
        FROM pts GROUP BY file
    ),
    tc AS (  -- type changes on edges whose parent is not the soma
        SELECT c.file,
               CAST(SUM(CASE WHEN c.type <> p.type AND p.type <> 1
                             THEN 1 ELSE 0 END) AS INT) AS n_type_changes
        FROM pts c JOIN pts p ON c.file = p.file AND c.parent = p.n
        GROUP BY 1
    )
    SELECT comp.file, comp.n_components, per_walk.max_branch_order,
           per_walk.max_path_length_x100,
           COALESCE(tc.n_type_changes, 0) AS n_type_changes
    FROM comp
    JOIN per_walk ON per_walk.file = comp.file
    LEFT JOIN tc ON tc.file = comp.file
    ORDER BY comp.file
    """,
    headline=True,
    doc="W2 per-tree traversal kernel (applyInPandas path accumulation) "
    "differentially validated on BRANCHING topology: the synthetic forest "
    "has two components and binary fan-out, and the oracle re-derives "
    "component count, branch order, and root-to-node path lengths with a "
    "recursive-CTE parent walk — certifying the kernel's traversal logic, "
    "not just chain arithmetic.",
)
def morphology_tree_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    metrics = tree_metrics(synth_points(spark, sf_dir))
    return metrics.select(
        "file",
        "n_components",
        "max_branch_order",
        quantized(F.col("max_path_length"), 2).alias("max_path_length_x100"),
        "n_type_changes",
    ).orderBy("file")


# Conversion round trip: same oracle as morphology_battery — the layout
# change (swc points -> h5 sections -> points) must never change a
# single battery value.
@register(
    "conversion_roundtrip_battery",
    REGISTRY["morphology_battery"].oracle,
    doc="Morphology format conversion (ref check_swc_on_resource.py:56-166 "
    "swc->h5 via morph_tool) certified by the differential gate: the "
    "synthesized SWC points convert to real classic-HDF5 bytes "
    "(sources/morph_convert section reconstruction + hdf5_lite writer), "
    "parse back through the v1-layout reader, and run the SAME battery "
    "against the SAME oracle as morphology_battery — any conversion "
    "lossiness (section splits, parent rewiring, diameter scaling, "
    "point reordering) hash-mismatches.",
)
def conversion_roundtrip_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.h5_morph import parse_h5_frame
    from ..sources.morph_convert import convert_morphologies

    h5 = convert_morphologies(synth_points(spark, sf_dir), to="h5")
    flags = morphology_flags(parse_h5_frame(h5))
    return flags.select(
        "file",
        "n_points",
        "n_roots",
        F.col("n_zero_radius").cast("bigint").alias("n_zero_radius"),
        "n_distinct_radii",
        "has_axon",
        "has_basal_dendrite",
        F.col("n_zero_len_segments").cast("bigint").alias("n_zero_len_segments"),
        F.col("n_z_jumps").cast("bigint").alias("n_z_jumps"),
        F.col("n_axon_trees").cast("bigint").alias("n_axon_trees"),
        F.col("n_dendritic_trees").cast("bigint").alias("n_dendritic_trees"),
        F.col("n_radical_diameter_changes")
        .cast("bigint")
        .alias("n_radical_diameter_changes"),
        (F.expr("(total_length_e4 + 50) div 100") / F.lit(100.0)).alias(
            "total_length"
        ),
        F.col("max_seg_len_e4").alias("max_seg_len_e4"),
    ).orderBy("file")
