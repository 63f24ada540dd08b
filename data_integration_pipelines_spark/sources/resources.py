"""JSON-LD resource ingest with load-time normalization (SURVEY §1.1).

The reference's corpus is JSON-LD documents whose shape is irregular:
any field can be scalar OR array (``_as_list`` idiom, ref
src/helpers.py:177-178, used 60+ times), coordinates can be bare
floats or ``{"@value": x}`` wrappers (ref src/neuron_morphology/
validation/region_comparison.py:64-69), and every document carries
store metadata under ``_``-prefixed keys (ref src/helpers.py:24-27).

Design: kill all irregularity ONCE at ingest (SURVEY §4 item 4) so no
downstream operator pays for it:

- ``normalize_resources`` wraps declared scalar-or-array fields into
  single-element arrays when the inferred schema made them scalars,
  and unwraps any struct that is exactly ``{"@value": x}``.
- ``split_store_metadata`` projects user-data vs store-metadata views.

All transformations are schema-driven Column expressions — the scan
stays a plain ``spark.read.json`` and Catalyst prunes/pushes as usual.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

# Store-metadata keys carried on every Nexus resource (ref src/helpers.py:24-27).
STORE_METADATA_KEYS = (
    "_constrainedBy",
    "_createdAt",
    "_createdBy",
    "_deprecated",
    "_incoming",
    "_outgoing",
    "_project",
    "_rev",
    "_schemaProject",
    "_self",
    "_updatedAt",
    "_updatedBy",
)


def _unwrap_value(col: Column, dtype: DataType) -> tuple[Column, DataType]:
    """Recursively unwrap ``{"@value": x}`` wrapper structs."""
    if isinstance(dtype, StructType):
        names = [f.name for f in dtype.fields]
        if names == ["@value"]:
            inner = dtype.fields[0].dataType
            return _unwrap_value(col.getField("@value"), inner)
        rebuilt = []
        new_fields = []
        changed = False
        for f in dtype.fields:
            sub, sub_t = _unwrap_value(col.getField(f.name), f.dataType)
            if sub_t is not f.dataType:
                changed = True
            rebuilt.append(sub.alias(f.name))
            new_fields.append((f.name, sub_t))
        if not changed:
            return col, dtype
        from pyspark.sql.types import StructField

        return (
            F.when(col.isNotNull(), F.struct(*rebuilt)),
            StructType([StructField(n, t) for n, t in new_fields]),
        )
    if isinstance(dtype, ArrayType):
        # unwrap inside array elements
        probe, elem_t = _unwrap_value(F.lit(None).cast(dtype.elementType), dtype.elementType)
        if elem_t is dtype.elementType:
            return col, dtype
        return (
            F.transform(col, lambda x: _unwrap_value(x, dtype.elementType)[0]),
            ArrayType(elem_t),
        )
    return col, dtype


def as_list(col: Column, dtype: DataType) -> Column:
    """``_as_list``: scalar -> [scalar], null -> [], array -> itself."""
    if isinstance(dtype, ArrayType):
        return F.coalesce(col, F.array())
    return F.when(col.isNull(), F.array()).otherwise(F.array(col))


def _rescue_string_array(col: Column) -> Column:
    """A scalar-or-array field whose inference collapsed to STRING:
    rows holding a JSON array parse with from_json; scalar rows wrap."""
    return (
        F.when(col.isNull(), F.array())
        .when(F.trim(col).startswith("["), F.from_json(col, "array<string>"))
        .otherwise(F.array(col))
    )


def _rescue_string_value(col: Column, primitive: str) -> Column:
    """A bare-or-``{"@value": x}`` field collapsed to STRING: unwrap the
    wrapper rows, cast the bare rows."""
    wrapped = F.from_json(col, f"struct<`@value`:{primitive}>").getField("@value")
    return F.when(F.trim(col).startswith("{"), wrapped).otherwise(col.cast(primitive))


def normalize_resources(
    df: DataFrame,
    array_fields: tuple[str, ...] = (),
    value_fields: dict[str, str] | None = None,
) -> DataFrame:
    """Normalize an inferred-schema resources DataFrame:

    1. every field in ``array_fields`` becomes array-typed (scalar rows
       wrapped, nulls -> empty arrays); fields whose inference collapsed
       to STRING (mixed scalar/array corpora do this) are rescued via
       ``from_json``;
    2. ``{"@value": x}`` wrapper structs unwrapped everywhere;
       ``value_fields`` maps field name -> primitive type for wrapped
       fields that collapsed to STRING (e.g. ``{"coord": "double"}``).
    """
    from pyspark.sql.types import StringType

    value_fields = value_fields or {}
    out_cols: list[Column] = []
    for f in df.schema.fields:
        col: Column = F.col(f.name)
        dtype: DataType = f.dataType
        if f.name in array_fields and isinstance(dtype, StringType):
            col = _rescue_string_array(col)
        elif f.name in value_fields and isinstance(dtype, StringType):
            col = _rescue_string_value(col, value_fields[f.name])
        else:
            col, dtype = _unwrap_value(col, dtype)
            if f.name in array_fields:
                col = as_list(col, dtype)
        out_cols.append(col.alias(f.name))
    return df.select(*out_cols)


def read_resources(
    spark: SparkSession,
    path: str,
    array_fields: tuple[str, ...] = ("type", "annotation", "distribution", "contribution"),
    value_fields: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JSON-lines resource corpus and normalize it."""
    return normalize_resources(spark.read.json(path), array_fields, value_fields)


def flatten_dotted(df: DataFrame, sep: str = ".") -> DataFrame:
    """Flatten nested structs to dotted leaf columns — the reference's
    ``forge.as_dataframe`` (ref src/neuron_morphology/validation/
    check_links.py:26-28). Arrays are kept as array cells (as_dataframe
    keeps lists); only struct nesting is flattened. Pure projection:
    column pruning still reaches the scan for any subset of leaves."""

    def leaves(col: Column, dtype: DataType, name: str):
        if isinstance(dtype, StructType):
            for f in dtype.fields:
                yield from leaves(col.getField(f.name), f.dataType, name + sep + f.name)
        else:
            yield col.alias(name)

    out: list[Column] = []
    for f in df.schema.fields:
        out.extend(leaves(F.col(f"`{f.name}`"), f.dataType, f.name))
    return df.select(*out)


def unflatten_dotted(df: DataFrame, sep: str = ".") -> DataFrame:
    """Rebuild nested structs from dotted column names — the reference's
    ``forge.from_dataframe(df, nesting=".")`` (ref src/neuron_morphology/
    morphology_registration.py:370). A struct whose leaves are all NULL
    in a row becomes NULL (round-trips flatten_dotted on sparse data)."""
    tree: dict = {}
    for name in df.columns:
        node = tree
        parts = name.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = name

    def build(node: dict | str) -> Column:
        if isinstance(node, str):
            return F.col(f"`{node}`")
        children = [build(v).alias(k) for k, v in node.items()]
        struct = F.struct(*children)
        any_set = F.greatest(*[c.isNotNull() for c in children]) if len(children) > 1 else children[0].isNotNull()
        return F.when(any_set, struct)

    return df.select(*[build(v).alias(k) for k, v in tree.items()])


def split_store_metadata(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(user_data, store_metadata) views; both keep ``id`` for joins."""
    meta_cols = [c for c in df.columns if c in STORE_METADATA_KEYS]
    user_cols = [c for c in df.columns if c not in STORE_METADATA_KEYS]
    meta = df.select(*(["id"] if "id" in user_cols else []), *meta_cols)
    user = df.select(*user_cols)
    return user, meta
