"""Aggregation / batching / profiling operators (SURVEY.md §2.6).

The reference accumulates per-message state in node attributes and
flushes on cleanup; the Spark forms are grouped aggregations with
map-side partial aggregation — the shape that scales, since each
executor pre-aggregates before the single shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metalpipe_spark.keypath import aggregate_values


def batch_messages(
    df: DataFrame, batch_size: int, key: Column | str, payload: list[str] | None = None
) -> DataFrame:
    """BatchMessages (node.py:1731-1754) — group the stream into batches
    of ``batch_size``, emitting one row per batch.

    The reference batches by arrival order (meaningless under distributed
    execution), so batches here are keyed deterministically:
    ``batch_id = floor(key / batch_size)``.  The final short batch is
    emitted, matching the reference's cleanup() flush.
    """
    col = F.col(key) if isinstance(key, str) else key
    payload = payload or [c for c in df.columns]
    n = int(batch_size)
    df = df.withColumn("__bm_key", col)
    ktype = df.schema["__bm_key"].dataType.simpleString()
    if ktype in ("tinyint", "smallint", "int", "bigint"):
        # Pure BIGINT floor-division (never `/`, which promotes to DOUBLE
        # and mis-batches 64-bit keys above 2^53 — the `ts div 1000`
        # rule): subtracting the non-negative pmod makes the numerator an
        # exact multiple, so `div` equals floor division for negative
        # keys too.
        df = df.withColumn("__bm_key", F.col("__bm_key").cast("long"))
        bid = F.expr(f"(__bm_key - pmod(__bm_key, {n}L)) div {n}L")
    else:
        # Fractional / other keys keep true floor(key / n) semantics — a
        # DOUBLE key of -0.5 belongs to batch -1, which a cast-to-long
        # path would truncate into batch 0.
        bid = F.floor(F.col("__bm_key") / F.lit(n))
    return (
        df.groupBy(bid.alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("batch_size"),
            F.sort_array(F.collect_list(F.struct(*payload))).alias("items"),
        )
    )


def aggregate_values_node(df: DataFrame, tail_path: str, output_key: str = "values") -> DataFrame:
    """AggregateValues (node.py:1278-1291) — collect every value at any
    nested path matching ``tail_path`` into one list column."""
    return df.withColumn(output_key, aggregate_values(df, tail_path))


def infer_string_types(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """get_type_information (table_nodes.py:34-43) — probe which primitive
    types every value of a string column can cast to, empirically.

    The reference tries ``int()``/``float()``/datetime parses per value;
    the distributed form is one aggregate pass: a column "is castable to
    T" iff no non-null value casts to null.  Returns one row per column
    with boolean capability flags — the input to schema-tightening."""
    cols = columns or [f.name for f in df.schema.fields]
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.when(s.try_cast("bigint").isNull() & s.isNotNull(), 1)).alias(f"{c}__not_int"),
            F.count(F.when(s.try_cast("double").isNull() & s.isNotNull(), 1)).alias(f"{c}__not_float"),
            F.count(F.when(F.try_to_timestamp(s).isNull() & s.isNotNull(), 1)).alias(f"{c}__not_ts"),
        ]
    row = df.agg(*aggs)
    profiles = [
        F.struct(
            F.lit(c).alias("column_name"),
            (F.col(f"{c}__not_int") == 0).alias("castable_int"),
            (F.col(f"{c}__not_float") == 0).alias("castable_float"),
            (F.col(f"{c}__not_ts") == 0).alias("castable_datetime"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*profiles)).alias("p")).select("p.*")


def row_stat_collector(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """RowStatCollector (node_classes/table_nodes.py:46-84) — per-column
    profile: row count, distinct count, null count, uniqueness flag.

    The reference streams rows through a Bloom filter; the distributed
    form is one pass of built-in aggregates per column (a single scan —
    Catalyst fuses the aggregates), then an unpivot to the profile shape:
    one row per column.  Exact distinct counts (the reference reports
    exact uniqueness); swap ``countDistinct`` for
    ``approx_count_distinct`` at the 100 TB tier where a 2% error is an
    acceptable price for no shuffle explosion.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    row = df.agg(*aggs)
    profiles = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            (F.col(f"{c}__rows") - F.col(f"{c}__nonnull")).alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            (F.col(f"{c}__distinct") == F.col(f"{c}__nonnull")).alias("is_unique"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*profiles)).alias("p"))
        .select("p.*")
    )


def funnel(
    df: DataFrame,
    stages: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per user, the first timestamp of each
    stage that occurs AT OR AFTER the previous stage's first timestamp,
    plus the deepest stage reached (0..len(stages)).

    Plan shape: chained conditional MIN windows over ONE hash exchange
    on ``user_col`` (each stage's window reuses the same partitioning,
    so Catalyst inserts no further shuffles — plan-tested) followed by
    the final per-user groupBy on the same key.  Per-task state is one
    user's events; no joins, no self-unions."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col)
    out = df
    prev_t = None
    tcols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev_t is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev_t))
        name = f"__t{i}"
        out = out.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_t = name
        tcols.append(name)
    stage_expr = F.lit(0)
    for i in range(len(stages)):
        stage_expr = F.when(
            F.min(F.col(tcols[i])).isNotNull(), F.lit(i + 1)
        ).otherwise(stage_expr)
    aggs = [stage_expr.cast("long").alias("stage")] + [
        F.unix_millis(F.min(tcols[i]).cast("timestamp")).alias(f"{stages[i]}_ms")
        for i in range(len(stages))
    ]
    return out.groupBy(user_col).agg(*aggs)


def retention_cohorts(
    df: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted on
    each later active day as an offset from their cohort day →
    ``(cohort_day, day_offset, n_users)``.

    Plan shape: distinct (user, day) → per-user min day (same-key
    groupBy, exchange reused) → join back on user (co-located) → count
    per (cohort, offset).  All aggregates partial-combine map-side;
    nothing is per-event after the first distinct."""
    days = df.select(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    cohort = days.groupBy(user_col).agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, user_col)
        .groupBy(
            # string day so results stay canonical across engines (DATE
            # cells canonicalize differently per client library)
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias(
                "day_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def pivot_pinned(
    df: DataFrame,
    group_cols: str | list[str],
    pivot_col: str,
    values: list,
    agg_col: str | Column,
    agg="sum",
    out_names: list[str] | None = None,
) -> DataFrame:
    """Pivot with PINNED values, planned as conditional aggregation.

    ``df.groupBy(k).pivot(p, values).agg(...)`` looks cheap but Catalyst
    plans it as TWO hash aggregates — a first ``groupBy(k, p)`` partial
    with its own shuffle, then a ``pivotfirst`` aggregate on ``k`` —
    3 Exchanges end to end.  Because the pivot values are pinned, the
    plan you actually want is one aggregate over CASE branches::

        groupBy(k).agg(agg(when(p == v0, x)), agg(when(p == v1, x)), ...)

    — ONE aggregate pair (partial + final), one shuffle on ``k``, and
    every branch map-side combined.  At 100 TB that is the difference
    between one data-scale exchange and two.

    ``agg`` is either a builtin name (sum/count/min/max/avg/first) or a
    callable ``Column -> Column`` (e.g. an exact-decimal sum) so money
    columns can keep the engine's bit-stable accumulation rule.
    ``out_names`` (default ``{pivot_col}_{value}``) names the wide
    columns — pass the same aliases the oracle SQL uses.

    Semantics are EXACTLY conditional aggregation's (the SQL ``CASE
    WHEN`` form): a (group, value) combination with no matching rows
    yields what the aggregate yields over zero rows — 0 for ``count``,
    NULL for the rest.  ``.pivot().agg(count(...))`` instead yields
    NULL there (its outer pivotfirst sees no row at all); this operator
    deliberately follows the SQL convention, matching its oracle form.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    col = F.col(agg_col) if isinstance(agg_col, str) else agg_col
    if callable(agg):
        agg_fn = agg
    else:
        builtin = {
            "sum": F.sum,
            "count": F.count,
            "min": F.min,
            "max": F.max,
            "avg": F.avg,
            "first": lambda c: F.first(c, ignorenulls=True),
        }
        try:
            agg_fn = builtin[agg]
        except KeyError:
            raise ValueError(
                f"pivot_pinned: unknown agg {agg!r}; "
                f"use one of {sorted(builtin)} or pass a callable"
            ) from None
    names = out_names or [f"{pivot_col}_{v}" for v in values]
    if len(names) != len(values):
        raise ValueError("pivot_pinned: out_names must match values 1:1")
    exprs = [
        agg_fn(F.when(F.col(pivot_col) == F.lit(v), col)).alias(n)
        for v, n in zip(values, names)
    ]
    return df.groupBy(*groups).agg(*exprs)


def time_rollup(
    df,
    ts_col: str,
    value_col: str,
    granularities: tuple[str, ...] = ("hour", "day"),
    group_cols: list[str] | None = None,
):
    """Hypertable-style multi-granularity downsampling: one aggregate
    row per (granularity, truncated bucket[, group...]) carrying
    count / sum / min / max / avg of ``value_col`` — the continuous-
    aggregate hierarchy a time-series store materializes (minute →
    hour → day), expressed as a union of ``date_trunc`` groupBys.

    Scale shape: each granularity is ONE map-side-combined shuffle
    whose key count is buckets × groups (collapsing with coarseness);
    the union is plan-level, no extra exchange.  At 100 TB the right
    deployment materializes each level to a partitioned table and
    derives coarser levels FROM finer ones (sum of sums) — the operator
    keeps per-level aggregation self-contained so either wiring works.
    """

    groups = list(group_cols or [])
    # DECIMAL accumulation (the engine's money-aggregation rule): a raw
    # DOUBLE sum's low-order bits depend on partition combine order, so
    # the same data at a different partitioning would flip the value
    # hash (reproduced: an 8-partition source diverged from the
    # sequential oracle sum in the 16th digit).  The exact decimal sum
    # casts to DOUBLE once; avg derives from it, never from a separate
    # order-sensitive average.
    dec = F.col(value_col).cast("decimal(28,12)")
    parts = []
    for g in granularities:
        parts.append(
            df.groupBy(
                F.lit(g).alias("granularity"),
                F.date_trunc(g, F.col(ts_col)).alias("bucket_ts"),
                *groups,
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec).alias("__s"),
                F.min(value_col).alias("min_value"),
                F.max(value_col).alias("max_value"),
            ).select(
                "granularity", "bucket_ts", *groups, "n",
                F.col("__s").cast("double").alias("sum_value"),
                "min_value", "max_value",
                (F.col("__s").cast("double") / F.col("n")).alias("avg_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
