"""Shared DuckDB-oracle comparison harness: mirrors the driver's t2 gate
(sorted columns, order-insensitive row compare, exact values)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import numpy as np

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    return v


def canonical_rows(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_canon(row[c]) for c in cols)
        for _, row in df_pandas[cols].iterrows()
    ]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _effective_kind(series) -> str:
    """Numpy dtype kind, but object columns (Decimal results, int columns
    made object by NULLs) resolve to the kind of their first non-null
    value — otherwise a real int-vs-float hash split hides behind 'O'."""
    k = series.dtype.kind
    if k != "O":
        return k
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, (bool, np.bool_)):
            return "b"
        if isinstance(v, (int, np.integer)):
            return "i"
        if isinstance(v, (float, np.floating, Decimal)):
            return "f"
        return "O"
    return "O"


def driver_strictness_errors(got_pd, want_pd) -> list[str]:
    """Checks the driver applies but lenient canonicalization hides:
    list-valued cells break its pandas sort, and int-vs-float dtype kinds
    hash differently even when values compare equal."""
    errs = []
    for name, df in (("spark", got_pd), ("oracle", want_pd)):
        for c in df.columns:
            if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                errs.append(f"{name}.{c} holds unhashable list cells")
    for c in sorted(set(got_pd.columns) & set(want_pd.columns)):
        gk, wk = _effective_kind(got_pd[c]), _effective_kind(want_pd[c])
        if {gk, wk} <= {"i", "u", "f"} and ("f" in {gk, wk}) != (gk == wk == "f"):
            errs.append(f"column {c}: dtype kind {gk} vs {wk} (int/float hash split)")
    return errs


def compare_with_oracle(spark_df, con, oracle: str, strict: bool = True):
    got_pd = spark_df.toPandas()
    want_pd = con.sql(oracle).df()
    if strict:
        errs = driver_strictness_errors(got_pd, want_pd)
        assert not errs, "; ".join(errs)
    return canonical_rows(got_pd), canonical_rows(want_pd)
