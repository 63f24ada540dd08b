"""Filter-DSL -> Column compiler.

Re-expresses the reference's high-level search DSL (S3/P2/P3):
``Filter(operator, path, value)`` lists as used by ``forge.search``
(ref src/neuron_morphology/query_data.py:18-48, src/e_model/querying.py:102-110)
where a path like ``["annotation", "hasBody", "label"]`` walks nested
structs AND implicitly quantifies over arrays (SPARQL property-path
semantics: the predicate holds if ANY element matches).

The compiler walks the DataFrame schema: struct fields become field
accesses, array-of-struct fields become ``exists(arr, x -> ...)``
(built-in higher-order function — JVM-side, no UDF). ``ne`` is
compiled as "no element equals" (NOT EXISTS), matching the
reference's use of ``__ne__`` to exclude curated resources.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c == v,  # negated at the quantifier level (NOT EXISTS eq)
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
    "contains": lambda c, v: c.contains(v),
    "in": lambda c, v: c.isin(*v),
}

NEGATED_OPS = frozenset({"ne"})


@dataclass(frozen=True)
class Filter:
    """One predicate of the search DSL: operator, nested path, value."""

    op: str
    path: tuple[str, ...]
    value: Any

    def __init__(self, op: str, path: list[str] | tuple[str, ...], value: Any):
        if op not in _OPS:
            raise ValueError(f"unsupported operator {op!r}; one of {sorted(_OPS)}")
        object.__setattr__(self, "op", op)
        object.__setattr__(self, "path", tuple(path))
        object.__setattr__(self, "value", value)


def _field_type(dtype: DataType, name: str) -> DataType:
    if not isinstance(dtype, StructType):
        raise ValueError(f"cannot descend into non-struct type {dtype.simpleString()} at {name!r}")
    for f in dtype.fields:
        if f.name == name:
            return f.dataType
    raise ValueError(f"no field {name!r} in {dtype.simpleString()}")


def _compile(col: Column, dtype: DataType, path: tuple[str, ...], leaf) -> Column:
    """Recursively walk `path`; arrays introduce an exists() quantifier."""
    if isinstance(dtype, ArrayType):
        elem = dtype.elementType
        return F.exists(col, lambda x: _compile(x, elem, path, leaf))
    if not path:
        return leaf(col)
    head, rest = path[0], path[1:]
    return _compile(col.getField(head), _field_type(dtype, head), rest, leaf)


def compile_filter(df: DataFrame, flt: Filter) -> Column:
    """Compile one Filter against ``df``'s schema into a boolean Column.

    The compiled condition is three-valued-logic-proofed with
    ``coalesce(cond, false)`` BEFORE any negation: a NULL array (or a
    NULL scalar leaf) makes ``exists()`` NULL, and a bare ``~NULL`` is
    still NULL — silently excluding no-annotation rows from negated
    filters, where SPARQL FILTER NOT EXISTS (the reference semantics,
    validation.py:405-411) includes them."""
    if not flt.path:
        raise ValueError("empty path")
    head, rest = flt.path[0], flt.path[1:]
    root_type = _field_type(df.schema, head)
    leaf = lambda c: _OPS[flt.op](c, flt.value)  # noqa: E731
    cond = F.coalesce(
        _compile(F.col(head), root_type, rest, leaf), F.lit(False)
    )
    return ~cond if flt.op in NEGATED_OPS else cond


def search(df: DataFrame, filters: list[Filter], limit: int | None = None) -> DataFrame:
    """``forge.search`` equivalent: AND of all filters, optional limit."""
    out = df
    for flt in filters:
        out = out.filter(compile_filter(df, flt))
    if limit is not None:
        out = out.limit(limit)
    return out
