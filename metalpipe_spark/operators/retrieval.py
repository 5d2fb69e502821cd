"""Hybrid retrieval: batched BM25 + reciprocal-rank fusion.

Part of the beyond-reference training-data surface (the reference has
no retrieval operators; its closest analogue is streaming keyed lookup,
`metalpipe/node.py` StreamingJoin — see SURVEY.md §2.5).  The standard
corpus-curation use is hybrid search over a candidate pool: a sparse
(BM25) and a dense (embedding cosine) ranker each produce per-query
rank lists, and reciprocal-rank fusion (Cormack, Clarke & Buettcher,
SIGIR 2009) combines them without score calibration — only RANKS cross
the fusion boundary, so the two retrievers' incomparable score scales
never meet.

Scale shape: the query set is small by definition, so every query-side
artifact broadcasts; corpus-scale work is one scan per retriever.  The
fusion input is queries × k rows per ranker — trivially small — and the
fused top-k is a per-query window over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k for a BATCH of queries (``queries`` carries
    ``(query_id, terms array<string>)``) — the multi-query twin of
    ``text.bm25_topk``, folding the SAME per-(doc, term) contribution
    rows (``bm25_per_term_scores``) so the two paths cannot drift.

    Plan shape: the union of all query terms becomes the scan's token
    filter (bounded driver fetch — the query set is small by
    definition), the per-(doc, term) tf agg is the only corpus-keyed
    shuffle, the (term → query) mapping broadcasts, and the per-query
    top-k is a partitioned window (WindowGroupLimit: at most ``k`` rows
    per query leave each map task)."""
    from pyspark.sql.window import Window

    from metalpipe_spark.operators.text import bm25_per_term_scores

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(F.col(terms_col))).alias("tok"),
    ).distinct()
    terms = sorted({r["tok"] for r in qterms.select("tok").distinct().collect()})
    per_term = bm25_per_term_scores(df, terms, text_col, id_col, k1=k1, b=b)
    folded = (
        per_term.join(F.broadcast(qterms), "tok")
        .groupBy(query_id_col, id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(F.col("tok"), F.col("c")))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("score")
        )
    )
    quant = folded.select(
        F.col(query_id_col), F.col(id_col), F.round("score", 6).alias("bm25")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("bm25"), F.asc(id_col))
    return quant.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= k
    )


def rrf_fuse(
    ranklists: dict[str, DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion: each source contributes
    ``1 / (c + rank)`` per (query, doc) it ranked; absent docs
    contribute nothing.  ``c=60`` is the paper's constant.  Returns
    ``(query_id, id, rrf, rnk)`` — ``rrf`` rounded to 9 decimals,
    rank ties broken by ascending id.

    Determinism: the per-(query, doc) sum is a LEFT FOLD over sources
    sorted by name (never a shuffle-order double SUM), the same
    convention as every fold in the engine, so a DuckDB
    ``list_reduce(list(v ORDER BY src))`` replays it bit-for-bit."""
    from pyspark.sql.window import Window

    tagged = None
    for name in sorted(ranklists):
        d = ranklists[name].select(
            F.col(query_id_col),
            F.col(id_col),
            F.lit(name).alias("__src"),
            (
                F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col).cast("double"))
            ).alias("__v"),
        )
        tagged = d if tagged is None else tagged.unionByName(d)
    fused = tagged.groupBy(query_id_col, id_col).agg(
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__src"), F.col("__v")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["__v"],
            ),
            9,
        ).alias("rrf")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("rrf"), F.asc(id_col))
    return fused.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= k
    )
