"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog (metalpipe_spark/catalog/) for
the DuckDB correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metalpipe_spark.catalog import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped star
    join (broadcast dims, single fact shuffle)."""
    registry = load_all()
    return registry["q05_region_revenue"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2).

    Deterministic name order: sample selection / rotation is the
    driver's job, and the contract surface must behave identically on
    every checkout (no dependence on local artifacts)."""
    reg = load_all()
    return {name: reg[name].build for name in sorted(reg)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions get rows-only checks."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
