"""Similarity-search catalog queries over the ``embeddings`` table.

Determinism: dot products fold left-to-right in DOUBLE on both engines
(Spark ``F.aggregate`` / DuckDB ``list_reduce``), similarities rounded to
6 decimals before ordering, total tie-break on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metalpipe_spark.catalog import register
from metalpipe_spark.operators.similarity import (
    brute_force_topk,
    deterministic_hyperplanes,
    lsh_neardup_pairs,
    pairwise_topk_per_label,
)
from metalpipe_spark.sources.readers import load_table

# Sequential double fold of a·b (p[1]=left element, p[2]=right element).
_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> p[1]::DOUBLE * p[2]::DOUBLE), (acc, x) -> acc + x)"
)


def _cos(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


@register(
    "q_ann_brute_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round({_cos('embedding', 'qv')}, 6) AS cosine_sim
    FROM embeddings, q
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-k vs the vec_id=0 query vector (exact baseline).",
)
def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return brute_force_topk(emb, [float(x) for x in qv], k=10)


@register(
    "q_ann_blocked_knn",
    f"""
    WITH a AS (SELECT label AS blk, vec_id AS d1, embedding AS v1 FROM embeddings),
         b AS (SELECT label AS blk, vec_id AS d2, embedding AS v2 FROM embeddings),
    scored AS (
      SELECT a.blk, d1, d2, round({_cos('v1', 'v2')}, 6) AS cosine_sim
      FROM a JOIN b ON a.blk = b.blk AND d1 <> d2
    ),
    ranked AS (
      SELECT blk, d1, d2, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY d1 ORDER BY cosine_sim DESC, d2) AS rnk
      FROM scored
    )
    SELECT blk, d1, d2, cosine_sim, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY d1, rnk
    """,
    doc="Blocked exact kNN within label blocks (IVF-cell stand-in; block-local join).",
)
def q_ann_blocked_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return pairwise_topk_per_label(emb, k=3, dim=64).orderBy("d1", "rnk")


@register(
    "q_ann_blocked_knn_gemm",
    None,  # rows-only: BLAS accumulation order != the SQL fold (last-ulp
    # differences), so a value-hash oracle would be flaky by construction.
    # Parity with the oracle-hashed exact twin is tolerance-tested in
    # tests/test_scale_utils.py instead.
    doc=(
        "Blocked exact kNN via per-cell GEMM (applyInPandas + BLAS) — the "
        "vectorized scale path; same results as q_ann_blocked_knn to ~1e-12."
    ),
)
def q_ann_blocked_knn_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.similarity import pairwise_topk_per_label_gemm

    emb = load_table(spark, sf_dir, "embeddings")
    return pairwise_topk_per_label_gemm(emb, k=3).orderBy("d1", "rnk")


@register(
    "q_ann_ivf_topk",
    None,  # rows-only: centroids are a seeded LEARNED artifact (iterative
    # k-means) — deterministic in-engine, not replayable in SQL.  Recall
    # vs brute force is asserted in tests/test_scale_utils.py.
    doc=(
        "Approximate self-kNN through a learned IVF index: spherical "
        "k-means cells, multi-probe search (centroids as plan literals, "
        "map-side probe ranking), cogrouped BLAS scoring per cell, one "
        "window for the global top-k."
    ),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k_cells=16, k=3, n_probe=2).orderBy("d1", "rnk")


def _lsh_oracle(num_planes: int = 8, dim: int = 64, threshold: float = 0.9) -> str:
    planes = deterministic_hyperplanes(num_planes, dim)
    bit_terms = " + ".join(
        f"(CASE WHEN {_DOT.format(a='embedding', b='[' + ', '.join(str(x) for x in h) + ']')} >= 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j, h in enumerate(planes)
    )
    return f"""
    WITH sig AS (
      SELECT vec_id, embedding, ({bit_terms}) AS bucket FROM embeddings
    )
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           round({_cos('a.embedding', 'b.embedding')}, 6) AS cosine_sim
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_cos('a.embedding', 'b.embedding')}, 6) >= {threshold}
    ORDER BY d1, d2
    """


@register(
    "q_embed_neardup_lsh",
    # Threshold 0.25: the synthetic embeddings are near-orthogonal (max
    # all-pairs cosine ≈ 0.51 at sf0.01), so a production-style 0.9
    # threshold returns zero rows — a trivially-passing check.  0.25
    # yields a real result set through the 8-plane buckets.
    _lsh_oracle(8, 64, 0.25),
    doc="Embedding-cosine near-dup via hyperplane LSH buckets; exact cosine verify inside buckets.",
)
def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_neardup_pairs(emb, num_planes=8, dim=64, threshold=0.25).orderBy("d1", "d2")


@register(
    "q_ann_batch_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round({_cos('e.embedding', 'q.qv')}, 6) AS cosine_sim
      FROM embeddings e, q
    ),
    ranked AS (
      SELECT query_id, vec_id, cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id
             ) AS rnk
      FROM scored
    )
    SELECT query_id, vec_id, cosine_sim, rnk
    FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
    doc=(
        "Batched serving-path ANN: broadcast query set scores map-side "
        "over one corpus scan; only the per-query top-k window shuffles."
    ),
)
def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.similarity import brute_force_topk_batch

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk_batch(emb, qs, k=5).orderBy("query_id", "rnk")
