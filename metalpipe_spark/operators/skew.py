"""Skew-handling join strategies (SURVEY.md §4.2 scale pass).

AQE's skew-join handles most cases (`spark.sql.adaptive.skewJoin` is on
in the session defaults); explicit salting remains for the shapes AQE
cannot fix — a shuffled join where one key holds a constant fraction of
the data (AQE splits partitions, but a single monster *key* still lands
in one task without salting).

``salted_join``: fact rows get a uniform salt in [0, buckets); the dim
side is replicated once per salt value.  The join key becomes
(key, salt), spreading each hot key over ``buckets`` tasks.  Cost: dim
side inflates by ``buckets``x — use for mid-size dims too big to
broadcast but small enough to replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: identical results to ``fact.join(dim,
    on, how)`` for inner/left joins, with hot fact keys spread over
    ``buckets`` tasks."""
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    out = salted_fact.join(salted_dim, on=keys + [SALT_COL], how=how)
    return out.drop(SALT_COL)
