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
