"""NRRD parsing, affine transforms, and broadcast-volume lookup."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from data_integration_pipelines_spark.operators.voxel import (
    affine_from_header,
    lookup_regions,
    make_affine,
    parse_nrrd,
    region_histogram,
)


def _nrrd_bytes(arr: np.ndarray, encoding: str = "raw") -> bytes:
    """Hand-rolled NRRD4 writer (sizes fastest-axis-first, C-order body
    = reverse-transposed array, matching the NRRD spec)."""
    body = arr.transpose(range(arr.ndim)[::-1]).tobytes()
    if encoding == "gzip":
        body = gzip.compress(body)
    header = "\n".join(
        [
            "NRRD0004",
            "# hand-written fixture",
            "type: int32",
            f"dimension: {arr.ndim}",
            f"sizes: {' '.join(str(s) for s in arr.shape)}",
            f"encoding: {encoding}",
            "endian: little",
            "space origin: (1,2,3)",
            "space directions: (2,0,0) (0,2,0) (0,0,4)",
        ]
    )
    return header.encode() + b"\n\n" + body


@pytest.fixture(scope="module")
def vol():
    rng = np.arange(2 * 3 * 4, dtype=np.int32).reshape(2, 3, 4)
    return rng


@pytest.mark.parametrize("encoding", ["raw", "gzip"])
def test_parse_nrrd_roundtrip(vol, encoding):
    arr, header = parse_nrrd(_nrrd_bytes(vol, encoding))
    np.testing.assert_array_equal(arr, vol)
    assert header["sizes"] == [2, 3, 4]
    assert header["space origin"] == [[1.0, 2.0, 3.0]]


def test_parse_nrrd_rejects_garbage():
    with pytest.raises(ValueError):
        parse_nrrd(b"PNG not an nrrd")


def test_affine_from_header(vol):
    _, header = parse_nrrd(_nrrd_bytes(vol))
    aff = affine_from_header(header)
    np.testing.assert_array_equal(aff[:3, 3], [1, 2, 3])
    np.testing.assert_array_equal(np.diag(aff)[:3], [2, 2, 4])
    # voxel (1,2,3) -> world
    world = aff @ np.array([1, 2, 3, 1.0])
    np.testing.assert_array_equal(world[:3], [3, 6, 15])


def test_lookup_regions_and_histogram(spark):
    # volume[ix,iy,iz] = 100*ix + 10*iy + iz on a 4^3 grid, spacing 2
    ix, iy, iz = np.indices((4, 4, 4))
    volume = (100 * ix + 10 * iy + iz).astype(np.int32)
    aff = make_affine((2, 2, 2), (0, 0, 0))
    pts = spark.createDataFrame(
        [
            (0, 0.0, 0.0, 0.0),      # voxel (0,0,0) -> 0
            (1, 3.9, 2.0, 7.9),      # voxel (1,1,3) -> 113
            (2, 6.0, 6.0, 6.0),      # voxel (3,3,3) -> 333
            (3, -1.0, 0.0, 0.0),     # out of bounds -> -1
            (4, 8.1, 0.0, 0.0),      # out of bounds -> -1
            (5, 3.9, 2.0, 7.9),      # same voxel as point 1
        ],
        "point_id int, x double, y double, z double",
    )
    labeled = lookup_regions(pts, volume, aff)
    got = {r["point_id"]: r["region_id"] for r in labeled.collect()}
    assert got == {0: 0, 1: 113, 2: 333, 3: -1, 4: -1, 5: 113}

    hist = {
        r["region_id"]: r["n_points"]
        for r in region_histogram(labeled, []).collect()
    }
    assert hist == {0: 1, 113: 2, 333: 1, -1: 2}
