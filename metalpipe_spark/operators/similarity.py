"""Similarity search over embedding columns (BASELINE.json north star).

Two tiers:
  * brute-force cosine top-k — exact baseline; a single scan with a
    per-row array reduction, then a top-k (no full sort: Spark's
    ``orderBy().limit(k)`` takes partial top-k per partition).
  * LSH-bucketed ANN (random-hyperplane signatures) — candidates meet
    through shared sign-pattern buckets, the scale path when the corpus
    no longer fits a single scan per query batch.

Arithmetic determinism: dot products and norms fold left-to-right over
the array (``F.aggregate``) in DOUBLE, which matches an equivalent
sequential fold in the oracle engine bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-to-right double fold of a·b.

    With ``dim`` known, the fold unrolls to explicit left-associated
    arithmetic (``x0*y0 + x1*y1 + …``) — whole-stage-codegen JVM math,
    measured several times faster than the interpreted higher-order
    ``aggregate`` form, and bit-identical to it (IEEE addition in the
    same order, and ``0.0 + t0 == t0`` exactly)."""
    if dim is not None:
        terms = [
            a.getItem(i).cast("double") * b.getItem(i).cast("double")
            for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector ships as a plan literal (broadcast by construction);
    at 100 TB this is one scan + partial top-k per partition + a k-row
    merge on the driver side of the exchange.
    """
    # HOF fold here: one pass over N rows — the unrolled form's codegen
    # compile cost exceeds its win at single-scan cardinalities.
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def pairwise_topk_per_label(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Blocked exact kNN: neighbors within the same label block (an IVF
    cell stand-in — at scale the label is a learned/hashed partition).
    Join is block-local (equi-join on the block key), never all-pairs."""
    from pyspark.sql.window import Window

    a = df.select(
        F.col(label_col).alias("blk"), F.col(id_col).alias("d1"), F.col(vec_col).alias("v1")
    )
    b = df.select(
        F.col(label_col).alias("blk"), F.col(id_col).alias("d2"), F.col(vec_col).alias("v2")
    )
    pairs = a.join(b, "blk").filter(F.col("d1") != F.col("d2"))
    scored = pairs.withColumn("cosine_sim", F.round(cosine(F.col("v1"), F.col("v2"), dim), 6))
    w = Window.partitionBy("d1").orderBy(F.desc("cosine_sim"), F.asc("d2"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("blk", "d1", "d2", "cosine_sim", "rnk")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    hyperplanes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign pattern of dot products with
    fixed hyperplanes.  Vectors sharing a bucket are ANN candidates."""
    bits = [
        F.when(
            dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in h]), dim=len(h)) >= 0,
            "1",
        ).otherwise("0")
        for h in hyperplanes
    ]
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def deterministic_hyperplanes(num: int, dim: int) -> list[list[float]]:
    """±1 hyperplanes from a fixed LCG — reproducible in any engine (the
    literal matrix ships into both the Spark plan and the oracle SQL)."""
    state = 0x2545F4914F6CDD1D
    planes = []
    for _ in range(num):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (state >> 32) & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_neardup_pairs(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane LSH.

    Scale shape: signature computed in the scan (no shuffle), candidates
    meet ONLY through shared sign buckets (one shuffle on the bucket
    key), exact cosine verifies inside each bucket.  All-pairs cost never
    materializes; recall is tunable with ``num_planes`` (fewer planes =
    bigger buckets = higher recall, more verify work).
    """
    planes = deterministic_hyperplanes(num_planes, dim)
    sigs = df.select(
        F.col(id_col),
        F.col(vec_col),
        *[
            F.when(dot(F.col(vec_col), F.array(*[F.lit(x) for x in h]), dim=dim) >= 0, 1)
            .otherwise(0)
            .alias(f"b{j}")
            for j, h in enumerate(planes)
        ],
    ).withColumn(
        "bucket",
        sum((F.col(f"b{j}") * (1 << j)) for j in range(num_planes)).cast("int"),
    )
    a = sigs.select(F.col("bucket"), F.col(id_col).alias("d1"), F.col(vec_col).alias("v1"))
    b = sigs.select(F.col("bucket"), F.col(id_col).alias("d2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, "bucket")
        .filter(F.col("d1") < F.col("d2"))
        .withColumn("cosine_sim", F.round(cosine(F.col("v1"), F.col("v2"), dim), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("d1", "d2", "cosine_sim")
        .dropDuplicates(["d1", "d2"])
    )
