"""Dotted-path UDF registry (SURVEY.md §2.12).

The reference loads user functions by dotted import path everywhere
(/root/reference/metalpipe/utils/helpers.py:39-45, node.py:237-247,
treehorn_yaccer.py:392-431).  The engine keeps the dotted-path contract
but wraps the callable for distributed execution: a declared return type
plus a vectorization mode.  ``pandas`` mode (Arrow-batched) is the
default — row-at-a-time Python UDFs are the documented slow path.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_function(path: str) -> Callable:
    """helpers.py:39-45 — import ``a.b.c.fn`` and return the callable."""
    module_path, _, fn_name = path.rpartition(".")
    if not module_path:
        raise ValueError(f"not a dotted path: {path!r}")
    module = importlib.import_module(module_path)
    return getattr(module, fn_name)


def wrap_udf(
    fn: Callable | str,
    return_type: T.DataType | str = "string",
    mode: str = "pandas",
):
    """Wrap a Python callable (or dotted path) as a Spark UDF.

    ``mode='pandas'`` vectorizes elementwise over pandas Series (Arrow
    transfer, ~10-100x over row-at-a-time); ``mode='arrow'`` uses the
    row-UDF API with Arrow enabled; ``mode='row'`` is the compatibility
    fallback for callables that cannot take Series.
    """
    if isinstance(fn, str):
        fn = load_function(fn)
    if mode not in ("pandas", "arrow", "row"):
        # a typo'd mode would otherwise silently fall through to the
        # row-at-a-time UDF — the documented 10-100x slow path.
        raise ValueError(f"wrap_udf mode must be pandas/arrow/row, got {mode!r}")
    if mode == "pandas":
        @F.pandas_udf(return_type)
        def _udf(*cols: pd.Series) -> pd.Series:
            return pd.Series([fn(*vals) for vals in zip(*cols)])

        return _udf
    useArrow = mode == "arrow"
    return F.udf(fn, return_type, useArrow=useArrow)


def wrap_vectorized(fn: Callable | str, return_type: T.DataType | str):
    """Wrap a callable that already operates on pandas Series directly —
    the fast path when the user function is numpy/pandas-native."""
    if isinstance(fn, str):
        fn = load_function(fn)
    return F.pandas_udf(return_type)(fn)
