"""Approximate sketches, Spark-first and ORACLE-EXACT.

Native approximate aggregates (``approx_count_distinct``,
``approx_percentile``) are engine-specific: their estimates cannot be
replayed bit-for-bit by another engine, so they can never pass a
value-hash correctness gate.  The sketches here are built from the
engine's portable md5-derived hashes and exact integer arithmetic, so
the SAME estimate falls out of Spark and of the DuckDB oracle — the
determinism rule every operator in this repo follows, applied to
cardinality estimation (Flajolet et al. 2007, HyperLogLog).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_count_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group —
    ``(group..., hll_estimate)`` — deterministic and exactly replayable
    in ANSI SQL:

    - hash = the portable 60-bit md5 hash (``dedup._hash64``): the
      register index is the top ``p`` bits, the rank is the number of
      leading zeros in the remaining ``w = 60 - p`` bits plus one,
      computed portably as ``w - length(bin(v)) + 1`` (``bin`` exists
      in Spark and DuckDB; no clz needed);
    - the harmonic sum Σ 2^-M[j] is EXACT INTEGER arithmetic: each
      register contributes ``1 << (w + 1 - M[j])`` to a BIGINT sum
      (max rank w+1 → term 1; absent registers contribute
      ``1 << (w + 1)`` each), divided once by ``2^(w+1)`` at the end —
      order-independent by construction, so partitioning never moves a
      bit and both engines agree to the last ulp;
    - the standard small-range correction (``E <= 2.5m`` with empty
      registers → linear counting ``m * ln(m / zeros)``) uses one
      ``ln`` on identical inputs.

    Plan shape: ONE map-side-combined shuffle on (group, bucket) —
    at most ``m = 2^p`` rows per group cross the wire regardless of
    input size — then a tiny per-group aggregate.  Accuracy is the
    classic ~1.04/sqrt(m) (≈1.6% at p=12).  For a mergeable persisted
    sketch, store the (group, bucket, max_rank) register table and
    re-aggregate with ``max`` — register max is the HLL merge."""
    from metalpipe_spark.operators.dedup import _hash64

    groups = list(group_cols or [])
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    h = _hash64(F.col(col))
    bucket = F.shiftright(h, w)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    rank = F.when(rem == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(rem)) + F.lit(1)
    )
    regs = (
        df.select(*groups, bucket.alias("__b"), rank.alias("__r"))
        .groupBy(*groups, "__b")
        .agg(F.max("__r").alias("__m"))
    )
    # Integer-exact Σ 2^-M: term = 2^(w+1-M) summed as BIGINT, plus
    # 2^(w+1) per absent register; one double division at the end.
    scale = 1 << (w + 1)
    per_group = regs.groupBy(*groups).agg(
        # SQL shiftleft takes a column shift amount (the PySpark wrapper
        # insists on a literal), and __m <= w+1 keeps the shift in range.
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - __m)")).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    harmonic = (
        F.col("__s") + (F.lit(m) - F.col("__present")) * F.lit(scale)
    ).cast("double") / F.lit(float(scale))
    raw = F.lit(alpha * m * m) / harmonic
    zeros = F.lit(m) - F.col("__present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *groups, F.round(est, 4).alias("hll_estimate")
    )
