"""Morphology format conversion (the reference's repair+convert step:
swc -> asc/h5 via morph_tool, ref src/neuron_morphology/validation/
check_swc_on_resource.py:56-166, morphology_registration.py:51-76).

Spark-first shape: conversion is a per-file kernel over the canonical
points table — ``applyInPandas`` groups one file per call, a pure
python/numpy section reconstruction runs inside, and the output is one
(file, content) row per morphology. Writers emit:

- **SWC text**: the plain point table (``points_to_swc_text``).
- **H5 v1 bytes**: points (N x 4, x/y/z/DIAMETER) + structure
  (S x 3, first-point/type/parent-section) via the native
  ``hdf5_lite`` writer — readable back by ``sources/h5_morph`` (and by
  h5py/morphio wherever those exist).

Section reconstruction (inverse of ``h5_morph``'s parent derivation):
a section is a maximal single-child chain of same-type points; breaks
at branch points, type changes, and roots. Points are renumbered
section-contiguous (the h5 v1 layout requirement); the tree SHAPE is
preserved exactly, so every downstream battery metric is invariant
under conversion — which is what the round-trip tests pin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

CONVERTED_SCHEMA = "file string, content binary"


def points_to_swc_text(pdf: pd.DataFrame) -> str:
    """One file's points -> SWC text (n type x y z radius parent)."""
    pdf = pdf.sort_values("n")
    lines = ["# converted by data_integration_pipelines_spark"]
    for r in pdf.itertuples():
        lines.append(
            f"{int(r.n)} {int(r.type)} {r.x:g} {r.y:g} {r.z:g} "
            f"{r.radius:g} {int(r.parent)}"
        )
    return "\n".join(lines) + "\n"


def _sections_from_points(pdf: pd.DataFrame):
    """Reconstruct contiguous sections from parent pointers. Returns
    (points Nx4 ordered section-contiguous, structure Sx3)."""
    pdf = pdf.sort_values("n")
    n_arr = pdf["n"].to_numpy()
    idx_of = {int(n): i for i, n in enumerate(n_arr)}
    types = pdf["type"].to_numpy()
    parents = pdf["parent"].to_numpy()
    xyz = pdf[["x", "y", "z"]].to_numpy(dtype=np.float64)
    diam = 2.0 * pdf["radius"].to_numpy(dtype=np.float64)

    children: dict[int, list[int]] = {}
    roots: list[int] = []
    for i, p in enumerate(parents):
        if p < 0:
            roots.append(i)
        else:
            children.setdefault(idx_of[int(p)], []).append(i)

    def is_break(child: int, parent: int) -> bool:
        return (
            len(children.get(parent, [])) != 1
            or types[child] != types[parent]
        )

    out_pts: list[tuple] = []
    structure: list[tuple[int, int, int]] = []
    section_of_point: dict[int, int] = {}
    # iterative DFS: (point index, parent section id)
    stack = [(r, -1) for r in reversed(roots)]
    while stack:
        start, parent_sec = stack.pop()
        sec_id = len(structure)
        structure.append((len(out_pts), int(types[start]), parent_sec))
        node = start
        while True:
            out_pts.append((xyz[node, 0], xyz[node, 1], xyz[node, 2], diam[node]))
            section_of_point[node] = sec_id
            kids = children.get(node, [])
            if len(kids) == 1 and not is_break(kids[0], node):
                node = kids[0]
                continue
            for k in reversed(kids):
                stack.append((k, sec_id))
            break
    return (
        np.asarray(out_pts, dtype=np.float64).reshape(-1, 4),
        np.asarray(structure, dtype=np.int64).reshape(-1, 3),
    )


def points_to_h5_bytes(pdf: pd.DataFrame) -> bytes:
    """One file's points -> classic-HDF5 morphology bytes (v1 layout)."""
    from .hdf5_lite import write_hdf5

    pts, structure = _sections_from_points(pdf)
    return write_hdf5({"points": pts, "structure": structure})


def convert_morphologies(points: DataFrame, to: str = "h5") -> DataFrame:
    """Distributed conversion: canonical points table -> one
    (file, content) row per morphology. ``to`` is 'h5', 'swc' or
    'asc' (see ``points_to_asc_text`` for the format's detached-stem
    semantics)."""
    if to not in ("h5", "swc", "asc"):
        raise ValueError(f"unsupported target format {to!r}")

    def one_file(pdf: pd.DataFrame) -> pd.DataFrame:
        name = pdf["file"].iloc[0]
        if to == "h5":
            content = points_to_h5_bytes(pdf)
        elif to == "asc":
            content = points_to_asc_text(pdf).encode()
        else:
            content = points_to_swc_text(pdf).encode()
        return pd.DataFrame([{"file": name, "content": bytearray(content)}])

    return points.groupBy("file").applyInPandas(one_file, schema=CONVERTED_SCHEMA)


_ASC_TYPE_WORDS = {1: "CellBody", 2: "Axon", 3: "Dendrite", 4: "Apical"}


def points_to_asc_text(pdf: pd.DataFrame) -> str:
    """One file's points -> ASC/Neurolucida s-expression text (the
    reference's third conversion target, ref morphology_registration.py
    swc->asc via morph_tool).

    ASC semantics: the soma and each neurite are SEPARATE top-level
    forms rooted at -1 — a neurite's attachment to a soma point is not
    expressible. The writer therefore detaches soma-attached stems into
    their own forms (exactly what morphio-based converters do); parsing
    the output back yields the same points/segments except the
    soma-stem segments, and n_roots grows by the stem count. Subtree
    type changes (heterogeneous neurites) are not expressible in ASC —
    the writer raises rather than silently mistyping."""
    pdf = pdf.sort_values("n")
    idx_of = {int(r.n): r for r in pdf.itertuples()}
    children: dict[int, list[int]] = {}
    roots: list[int] = []
    for r in pdf.itertuples():
        p = int(r.parent)
        if p < 0:
            roots.append(int(r.n))
        else:
            children.setdefault(p, []).append(int(r.n))

    # detach soma-attached stems (type != parent's soma type)
    forms: list[tuple[int, int]] = []  # (root point n, type)
    for root in roots:
        forms.append((root, int(idx_of[root].type)))
    for r in pdf.itertuples():
        p = int(r.parent)
        if p > 0 and int(idx_of[p].type) == 1 and int(r.type) != 1:
            forms.append((int(r.n), int(r.type)))

    detached = {n for n, _ in forms}

    def point_line(n: int, indent: str) -> str:
        r = idx_of[n]
        return f"{indent}({r.x:g} {r.y:g} {r.z:g} {2.0 * r.radius:g})"

    def emit_chain(n: int, form_type: int, indent: str, out: list[str]) -> None:
        while True:
            r = idx_of[n]
            if int(r.type) != form_type:
                raise ValueError(
                    f"ASC cannot express a type change inside a tree "
                    f"(point {n}: {int(r.type)} != {form_type})"
                )
            out.append(point_line(n, indent))
            kids = [k for k in children.get(n, []) if k not in detached]
            if not kids:
                return
            if len(kids) == 1:
                n = kids[0]
                continue
            out.append(indent + "(")
            for i, k in enumerate(kids):
                if i:
                    out.append(indent + " |")
                emit_chain(k, form_type, indent + "  ", out)
            out.append(indent + ")")
            return

    blocks: list[str] = []
    for root, ftype in forms:
        out = [f"(({_ASC_TYPE_WORDS.get(ftype, 'Dendrite')})"]
        emit_chain(root, ftype, " ", out)
        out.append(")")
        blocks.append("\n".join(out))
    return "\n\n".join(blocks) + "\n"
