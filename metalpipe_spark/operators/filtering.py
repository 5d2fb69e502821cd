"""Filter / predicate operators (SURVEY.md §2.4).

The reference's Filter node drops non-passing messages by emitting a
``NothingToSeeHere`` sentinel (/root/reference/metalpipe/node.py:1294-1343).
Here a filter is a Catalyst predicate — pushed down to the scan whenever
the source supports it, which at 100 TB is the difference between reading
a partition and reading the lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from metalpipe_spark.functions.scalars import to_bool
from metalpipe_spark.keypath import get_value, parse_keypath


def filter_node(
    df: DataFrame,
    test: str,
    test_keypath: str,
    value: bool = True,
) -> DataFrame:
    """Filter (node.py:1294-1343) with its three built-in tests.

    * ``key_exists``        — static in Spark (schemas are fixed): for a
      plain column it is a compile-time constant; for MapType columns it
      becomes ``map_contains_key`` per row.
    * ``value_is_not_none`` — ``isNotNull`` at the keypath.
    * ``value_is_true``     — reference ``to_bool`` truthiness.

    ``value=False`` inverts the test, matching ``result == self.value``.
    """
    if test == "key_exists":
        keys = parse_keypath(test_keypath)
        if len(keys) == 1:
            # Static schemas make top-level key existence a compile-time fact.
            pred = F.lit(keys[0] in df.columns)
        else:
            parent_type = df.select(get_value(keys[:-1]).alias("_p")).schema["_p"].dataType
            parent = get_value(keys[:-1])
            if isinstance(parent_type, T.MapType):
                # Open-keyed dicts map to MapType: per-row membership test.
                pred = F.map_contains_key(parent, F.lit(keys[-1]))
            elif isinstance(parent_type, T.StructType) and keys[-1] not in parent_type.names:
                # "key existence is a compile-time fact" must hold at any
                # depth: a missing struct FIELD is the compile-time False
                # the reference's message.get() semantics imply —
                # getField() on it would instead throw an
                # AnalysisException at plan time.
                pred = F.lit(False)
            else:
                pred = parent.getField(keys[-1]).isNotNull()
    elif test == "value_is_not_none":
        pred = get_value(test_keypath).isNotNull()
    elif test == "value_is_true":
        pred = to_bool(get_value(test_keypath))
    else:
        raise ValueError(f"Unknown test: {test}")

    if not value:
        # NULL-safe complement: to_bool(NULL) / getField on a NULL struct
        # evaluate to NULL, and ~NULL is still NULL — a plain inversion
        # would drop NULL rows under BOTH value=True and value=False.
        # The reference's value=False keeps them (message.get(key, False)
        # -> False; False == False passes, node.py Filter).
        pred = ~F.coalesce(pred, F.lit(False))
    return df.filter(pred)


def random_sample(df: DataFrame, sample: float = 0.1, seed: int | None = None) -> DataFrame:
    """RandomSample (node.py:1055-1065) — Bernoulli sample."""
    return df.sample(fraction=sample, seed=seed)


def systematic_sample(df: DataFrame, key: Column | str, modulus: int, remainder: int = 0) -> DataFrame:
    """Deterministic 1-in-N sample keyed on a column — the reproducible
    variant used where results must be oracle-comparable."""
    col = F.col(key) if isinstance(key, str) else key
    return df.filter(F.pmod(col, F.lit(modulus)) == remainder)
