"""Oracle-parity tests: every catalog query with an oracle must match
DuckDB exactly at sf0.001 — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from metalpipe_spark.catalog import load_all
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_with_oracle, duckdb_con

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, con, name):
    q = REGISTRY[name]
    df = q.build(spark, SF_ORACLE)
    got, want = compare_with_oracle(df, con, q.oracle)
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    mismatches = [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


def test_all_queries_nonempty(spark):
    """Every catalog query must produce a stable schema and >= 0 rows."""
    for name, q in REGISTRY.items():
        df = q.build(spark, SF_ORACLE)
        assert df.columns, name
