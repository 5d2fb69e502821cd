"""Join operators (SURVEY.md §2.5).

The reference's only real join is the ``retain_input`` merge — every
output record carries its upstream keys (node_queue/queue.py:91-102) —
plus a stubbed windowed StreamingJoin (node.py:1528-1552).  Spark picks
the physical strategy (broadcast / shuffled-hash / sort-merge); the
engine's job is to declare join type and keys and to *hint* broadcast for
dimension tables so a 100 TB fact scan never shuffles on a 25-row dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def enrich_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast_dim: bool = True,
    prefer_existing_value: bool = False,
) -> DataFrame:
    """retain_input-style enrichment join (queue.py:91-102).

    The fact side keeps all its columns; the dim side contributes its
    non-key columns.  On a name clash the dim (new) value wins unless
    ``prefer_existing_value`` — the reference's merge precedence
    (node.py:205-207).  ``broadcast_dim`` marks the dim for a broadcast
    hash join, eliminating the fact-side shuffle.
    """
    join_keys = [on] if isinstance(on, str) else list(on)
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    clashes = [c for c in dim.columns if c in fact.columns and c not in join_keys]
    if prefer_existing_value:
        dim_side = dim_side.drop(*clashes)
    else:
        fact = fact.drop(*clashes)
    return fact.join(dim_side, on=join_keys, how=how)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the value columns of
    the most recent right row with the same key and ``right_ts <=
    left_ts`` (NULLs when no such row exists — left-join semantics).

    Spark has no ASOF JOIN operator; the naive range-join formulation is
    O(n*m) per key.  This is the scalable union-window shape instead: tag
    both sides, union, and run one ``last(..., ignorenulls)`` window per
    value column ordered by (ts, side).  Cost = ONE shuffle on the key +
    a per-partition sort — the same plan a 1000-executor cluster wants,
    with no skew beyond the key's own distribution and no broadcast of
    either side.  Ties (equal ts on both sides) match, as in DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``: the right row sorts first.
    """
    value_cols = list(value_cols or [c for c in right.columns if c not in (on, right_ts)])
    # The matched right timestamp is part of the result (callers need to
    # know *when* the as-of match happened), so it rides along as a value.
    carried = [right_ts] + value_cols
    tagged_vals = [f"{prefix}{c}" for c in carried]

    lhs = left.withColumn("__side", F.lit(1))
    for c, t in zip(carried, tagged_vals):
        lhs = lhs.withColumn(t, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(t) for c, t in zip(carried, tagged_vals)],
    )
    merged = lhs.select(*lhs.columns).unionByName(rhs, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for t in tagged_vals:
        merged = merged.withColumn(t, F.last(t, ignorenulls=True).over(w))
    return merged.filter(F.col("__side") == 1).drop("__side")
