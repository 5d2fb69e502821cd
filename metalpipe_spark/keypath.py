"""Keypath addressing over nested schemas.

The reference addresses arbitrarily nested dicts with keypaths and
*tail-matching* — apply a function at every path whose suffix matches a
target path (/root/reference/metalpipe/utils/helpers.py:105-124,309-331).
In Spark the schema is static, so keypath resolution is compile-time: we
walk the StructType once and emit plain Column expressions (SURVEY.md
§1.2.4).  No per-row traversal ever happens.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_keypath(path: str | Sequence[str], delimiter: str = ".") -> list[str]:
    """helpers.py:105-111 — a keypath is a delimiter-joined string or an
    explicit list of keys."""
    if isinstance(path, str):
        return path.split(delimiter)
    return list(path)


def get_value(path: str | Sequence[str], delimiter: str = ".") -> Column:
    """helpers.py:105-124 (get_value) — address a (possibly nested) field.

    Returns a Column; resolution of struct hops is delegated to Catalyst.
    """
    keys = parse_keypath(path, delimiter)
    col = F.col(keys[0])
    for key in keys[1:]:
        col = col.getField(key)
    return col


def all_paths(schema: T.StructType) -> list[tuple[str, ...]]:
    """Enumerate every field path in a nested schema (arrays descended
    into their element type).  This is the static analogue of the
    reference's recursive dict walk (helpers.py:276-298)."""
    out: list[tuple[str, ...]] = []

    def walk(dt: T.DataType, prefix: tuple[str, ...]) -> None:
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                p = prefix + (f.name,)
                out.append(p)
                walk(f.dataType, p)
        elif isinstance(dt, T.ArrayType):
            walk(dt.elementType, prefix)

    walk(schema, ())
    return out


def paths_matching_tail(
    schema: T.StructType, tail: str | Sequence[str], delimiter: str = "."
) -> list[tuple[str, ...]]:
    """helpers.py:276-298 (iterate_leaves / tail match) — all schema paths
    whose suffix equals ``tail``."""
    t = tuple(parse_keypath(tail, delimiter))
    return [p for p in all_paths(schema) if p[-len(t) :] == t]


def set_value(df: DataFrame, path: str | Sequence[str], value: Column) -> DataFrame:
    """helpers.py:153-163 (set_value) — write a value at a keypath.

    Top-level paths use ``withColumn``; nested struct paths rewrite the
    field in place with ``withField`` so sibling fields are retained.
    """
    keys = parse_keypath(path)
    if len(keys) == 1:
        return df.withColumn(keys[0], value)
    root = keys[0]
    inner = ".".join(keys[1:])
    return df.withColumn(root, F.col(root).withField(inner, value))


def replace_by_path(
    df: DataFrame,
    tail: str | Sequence[str],
    fn,
) -> DataFrame:
    """helpers.py:309-331 (replace_by_path) — apply ``fn`` (Column ->
    Column) at every path whose suffix matches ``tail``.

    Paths under arrays are rewritten with ``transform`` so the whole
    operation stays columnar.  Currently supports fields nested under at
    most one array level per path (covers the reference's test surface);
    deeper array nesting raises.
    """
    schema = df.schema
    for path in paths_matching_tail(schema, tail):
        df = _rewrite_path(df, schema, path, fn)
    return df


def aggregate_values(df: DataFrame, tail: str | Sequence[str]) -> Column:
    """helpers.py:334-350 (aggregate_values) — collect the values at every
    tail-matching path into one array column."""
    paths = paths_matching_tail(df.schema, tail)
    if not paths:
        return F.array()
    cols = []
    for p in paths:
        c, in_array = _column_for_path(df.schema, p)
        cols.append(c if in_array else F.array(c))
    return F.flatten(F.array(*cols)) if len(cols) > 1 else cols[0]


def _getter(key: str):
    """Closure factory: F.transform binds every lambda param to a Column,
    so a ``k=key`` default would receive the array index instead."""
    return lambda x: x.getField(key)


def _column_for_path(schema: T.StructType, path: tuple[str, ...]):
    """Resolve a schema path to a Column; returns (col, is_array_valued).

    Crossing an ArrayType maps the remaining access over the elements
    (``transform``), yielding an array of the leaf values.
    """
    dt: T.DataType = schema
    col: Column | None = None
    in_array = False
    for key in path:
        assert isinstance(dt, T.StructType), f"cannot descend into {dt} at {key}"
        field = dt[key]
        if col is None:
            col = F.col(key)
        elif in_array:
            col = F.transform(col, _getter(key))
        else:
            col = col.getField(key)
        dt = field.dataType
        while isinstance(dt, T.ArrayType):
            if in_array:
                col = F.flatten(col)
            in_array = True
            dt = dt.elementType
    return col, in_array


def _rewrite_path(df: DataFrame, schema: T.StructType, path: tuple[str, ...], fn) -> DataFrame:
    """Rewrite the value at one exact path with fn, preserving siblings."""
    # Find the first array crossing, if any.
    dt: T.DataType = schema
    array_at = None
    for i, key in enumerate(path):
        field = dt[key]
        dt = field.dataType
        if isinstance(dt, T.ArrayType):
            if array_at is not None:
                raise NotImplementedError(
                    f"replace_by_path: >1 array level on path {path}"
                )
            array_at = i
            dt = dt.elementType

    if array_at is None:
        target = get_value(list(path))
        return set_value(df, list(path), fn(target))

    # path[:array_at+1] is the array column; rewrite each element.
    arr_path = list(path[: array_at + 1])
    rest = list(path[array_at + 1 :])
    arr_col = get_value(arr_path)

    def rewrite_elem(x: Column) -> Column:
        if not rest:
            return fn(x)
        inner = ".".join(rest)
        return x.withField(inner, fn(x.getField(rest[0]) if len(rest) == 1 else _descend(x, rest)))

    new_arr = F.transform(arr_col, rewrite_elem)
    return set_value(df, arr_path, new_arr)


def _descend(col: Column, keys: list[str]) -> Column:
    for k in keys:
        col = col.getField(k)
    return col
