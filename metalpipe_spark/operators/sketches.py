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


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Build a count-min sketch TABLE over a column — ``(row, bucket,
    c)`` with ``depth * width`` rows total regardless of input size
    (Cormode & Muthukrishnan 2005): hash row j maps a value through the
    engine's affine md5 family (``dedup.minhash_coefficients`` — the
    same deterministic coefficients MinHash uses) into ``width``
    buckets and counts collisions.  ONE map-side-combined shuffle whose
    key space is depth x width; the sketch is mergeable by summing
    counters (grouped on row/bucket/depth/width).  The GEOMETRY rides
    along as constant ``depth``/``width`` columns, so
    :func:`count_min_lookup` always hashes with the sketch's own
    parameters — a caller-supplied mismatch would silently produce
    under-estimates of 0 and break the one-sided contract.  Same
    determinism contract as :func:`hll_count_distinct`: md5-derived
    hashing and integer counters, so the DuckDB oracle reproduces
    every counter exactly."""
    h, rows = _cm_bucket_structs(col, depth, width)
    return (
        df.select(F.explode(F.array(*rows)).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "row", "bucket", "c",
            F.lit(depth).alias("depth"), F.lit(width).alias("width"),
        )
    )


def _cm_bucket_structs(col: str, depth: int, width: int):
    from metalpipe_spark.operators.dedup import _hash32, minhash_coefficients

    h = _hash32(F.col(col))
    mod = F.lit(1 << 32).cast("long")
    rows = [
        F.struct(
            F.lit(j).alias("row"),
            (((F.lit(a) * h + F.lit(b)) % mod) % F.lit(width)).alias("bucket"),
        )
        for j, (a, b) in enumerate(minhash_coefficients(depth))
    ]
    return h, rows


def count_min_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
) -> DataFrame:
    """Point-frequency estimates for the values in ``queries[col]``:
    min over the sketch's ``depth`` counters at the value's buckets,
    with the hashing geometry READ FROM THE SKETCH ITSELF (its
    ``depth``/``width`` columns) so a mismatched re-hash is impossible
    by construction.  The sketch (depth x width rows, bounded)
    broadcasts; an absent counter is a true zero (no item ever hashed
    there), so estimates stay one-sided — ``cm_estimate >= true
    count`` always, the property the tests pin.  Query set stays
    distributed (a heavy-hitter candidate list can be millions of
    rows)."""
    meta = sketch.select("depth", "width").first()
    depth, width = int(meta["depth"]), int(meta["width"])
    _, rows = _cm_bucket_structs(col, depth, width)
    exploded = queries.select(F.col(col), F.explode(F.array(*rows)).alias("rb")).select(
        col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    joined = exploded.join(
        F.broadcast(sketch.select("row", "bucket", "c")), ["row", "bucket"], "left"
    ).select(col, F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    return joined.groupBy(col).agg(F.min("c").alias("cm_estimate"))
