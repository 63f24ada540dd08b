"""Query registry shared by ``__spark_entry__``, ``bench.py`` and tests.

Each entry pairs a Spark DataFrame plan with an equivalent ANSI-SQL
oracle (run by DuckDB over the same parquet tables). Column names are
aliased identically on both sides — the driver's comparator sorts
columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""  # SURVEY §2 operator ids this query exercises
    headline: bool = False  # included in bench.py
    # True when fn() itself runs Spark jobs (driver-loop algorithms
    # like k-means fitting) — bench.py must then time CONSTRUCTION +
    # execution, or the iterations would be dishonestly excluded
    time_build: bool = False

    def __post_init__(self) -> None:
        if self.doc and not self.fn.__doc__:
            self.fn.__doc__ = self.doc


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    headline: bool = False,
    time_build: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc,
            headline=headline,
            time_build=time_build,
        )
        return fn

    return deco
