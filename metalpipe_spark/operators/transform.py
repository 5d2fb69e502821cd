"""Projection / column-transform operators (SURVEY.md §2.3).

Reference nodes rebuild one dict per message; here each operator is a
``DataFrame -> DataFrame`` function that *adds or rewrites columns*,
reproducing the reference's ``retain_input`` merge semantics
(/root/reference/metalpipe/node_queue/queue.py:91-102): output keys win
over input keys unless ``prefer_existing_value``.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metalpipe_spark.keypath import get_value, replace_by_path, set_value


def remapper(df: DataFrame, mapping: Mapping[str, Any]) -> DataFrame:
    """Remapper (node.py:1694-1702; remap_dictionary helpers.py:176-191).

    ``mapping`` is a (possibly nested) template whose leaves name source
    keypaths; the output message has the template's shape.  Nested
    template levels compile to ``struct()`` columns.
    """

    def build(spec: Any) -> Column:
        if isinstance(spec, Mapping):
            return F.struct(*[build(v).alias(k) for k, v in spec.items()])
        return get_value(spec)

    return df.select(*[build(v).alias(k) for k, v in mapping.items()])


def insert_data(
    df: DataFrame,
    values: Mapping[str, Any],
    overwrite: bool = True,
    overwrite_if_null: bool = True,
) -> DataFrame:
    """InsertData (node.py:1034-1052) — add constant columns.

    * column absent            -> added
    * present, overwrite       -> replaced
    * present, overwrite_if_null -> ``coalesce(existing, lit)``
    * present, neither         -> kept
    """
    for key, val in values.items():
        lit = F.lit(val)
        if key not in df.columns:
            df = df.withColumn(key, lit)
        elif overwrite:
            df = df.withColumn(key, lit)
        elif overwrite_if_null:
            df = df.withColumn(key, F.coalesce(F.col(key), lit))
    return df


def substitute_regex(
    df: DataFrame, key: str, match_regex: str, substitute_string: str
) -> DataFrame:
    """SubstituteRegex (node.py:1068-1077) — ``re.sub`` on one column,
    compiled to the JVM-side ``regexp_replace``.  Writes THROUGH the
    keypath (``set_value``): a dotted key rewrites the nested field —
    ``withColumn`` alone would leave the nested field untouched and add
    a literal top-level column named "a.b"."""
    return set_value(
        df, key, F.regexp_replace(get_value(key), match_regex, substitute_string)
    )


def simple_transforms(
    df: DataFrame,
    transforms: list[Mapping[str, Any]],
) -> DataFrame:
    """SimpleTransforms (node.py:1194-1254).

    Each spec is ``{"path": tail_keypath, "target_function": Column->Column}``
    or ``{"path": ..., "target_value": literal}``; the function/value is
    applied at *every* nested path whose suffix matches (the reference's
    ``replace_by_path`` tail-matching, helpers.py:309-331).  Functions are
    Column transforms so the whole pass stays inside Catalyst; arbitrary
    Python callables should be wrapped via
    :mod:`metalpipe_spark.udf_registry` first.
    """
    for spec in transforms:
        path = spec["path"]
        if "target_function" in spec:
            fn = spec["target_function"]
        else:
            value = spec["target_value"]
            fn = lambda _c, _v=value: F.lit(_v)
        df = replace_by_path(df, path, fn)
    return df


def function_of_message(
    df: DataFrame, fn: Callable, schema, output_key: str | None = None
) -> DataFrame:
    """FunctionOfMessage (node.py:996-1013) — apply a Python function to
    the whole record.  The general escape hatch: Arrow-batched
    ``mapInPandas`` so the Python boundary is vectorized, never per-row
    over a collect.  ``fn`` receives a pandas DataFrame and returns one
    conforming to ``schema``."""
    if output_key is not None:
        def gen(batches):
            for pdf in batches:
                out = pdf.copy()
                out[output_key] = fn(pdf)
                yield out

        return df.mapInPandas(gen, schema=schema)

    def gen(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(gen, schema=schema)


def serializer(df: DataFrame, key: str, output_key: str | None = None) -> DataFrame:
    """Serializer (node.py:1257-1275) — explode an iterable column into
    one row per element, retaining the other columns (the reference's
    retain_input merge)."""
    out = output_key or key
    return df.withColumn(out, F.explode(get_value(key)))
