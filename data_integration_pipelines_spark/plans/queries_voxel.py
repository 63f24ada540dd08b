"""Voxel-region lookup queries: broadcast 3-D volume + affine
world->voxel transform + per-region histograms (SURVEY §1.3, §2.9
voxel kernels, A4 histograms).

The fixture volume is ANALYTIC — region[ix,iy,iz] = (31*ix + 17*iy +
7*iz) % 50 over a 50^3 grid with spacing 2.0 and origin 0 — so the
oracle can recompute every lookup with integer floor arithmetic while
the Spark side exercises the real path: driver-built ndarray,
``sparkContext.broadcast``, inverse-affine multiply and vectorized
gather inside an Arrow-batched pandas UDF. Spacing is a power of two
so floor((coord - origin)/spacing) is exact in both engines.

Synthetic points come from the part table: coordinate c_k =
((p_partkey * m_k) % 400) / 4.0 for per-axis multipliers m_k, i.e.
world coords in [0, 100) -> all in-bounds.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.voxel import lookup_regions, make_affine, region_histogram
from .base import register

_N = 50  # grid side
_SPACING = (2.0, 2.0, 2.0)
_ORIGIN = (0.0, 0.0, 0.0)
_MULT = (7, 13, 29)  # per-axis point multipliers


def _volume() -> np.ndarray:
    ix, iy, iz = np.indices((_N, _N, _N))
    return ((31 * ix + 17 * iy + 7 * iz) % 50).astype(np.int32)


def _points(spark: SparkSession, sf_dir: str, limit: int) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < limit)
    coords = {
        axis: (((F.col("p_partkey") * m) % 400) / F.lit(4.0)).alias(axis)
        for axis, m in zip(("x", "y", "z"), _MULT)
    }
    return part.select(F.col("p_partkey").alias("point_id"), *coords.values())


_ORACLE_IDX = """
        SELECT p_partkey AS point_id,
               ((p_partkey * 7) % 400) / 4.0 AS x,
               ((p_partkey * 13) % 400) / 4.0 AS y,
               ((p_partkey * 29) % 400) / 4.0 AS z,
               CAST((31 * (((p_partkey * 7) % 400) // 8)
                   + 17 * (((p_partkey * 13) % 400) // 8)
                   +  7 * (((p_partkey * 29) % 400) // 8)) % 50 AS INT) AS region_id
        FROM part WHERE p_partkey < {limit}
"""


@register(
    "voxel_region_lookup",
    "WITH pts AS (" + _ORACLE_IDX.format(limit=300) + """)
    SELECT point_id, x, y, z, region_id FROM pts ORDER BY point_id
    """,
    doc="Per-point voxel-region lookup: broadcast ndarray volume + "
    "inverse-affine multiply + floor-index gather in an Arrow-batched "
    "pandas UDF (ref morph_metrics_dke.py:123-152, "
    "region_comparison.py:81-105).",
)
def voxel_region_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import presented

    pts = _points(spark, sf_dir, 300)
    labeled = lookup_regions(pts, _volume(), make_affine(_SPACING, _ORIGIN))
    # presented(): the voxel-lookup kernel is shuffle-free — a bare
    # orderBy would run it twice (range-partition sampling)
    return presented(
        labeled.select("point_id", "x", "y", "z", "region_id"), "point_id"
    )


@register(
    "voxel_region_histogram",
    "WITH pts AS (" + _ORACLE_IDX.format(limit=2000) + """)
    SELECT region_id, CAST(COUNT(*) AS BIGINT) AS n_points
    FROM pts GROUP BY region_id ORDER BY region_id
    """,
    headline=True,
    doc="A4 per-region point histogram over the voxel lookup: the "
    "morphology-points-per-brain-region rollup of "
    "ref morph_metrics_dke.py:84-105,165-271.",
)
def voxel_region_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir, 2000)
    labeled = lookup_regions(pts, _volume(), make_affine(_SPACING, _ORIGIN))
    return region_histogram(labeled, []).orderBy("region_id")
