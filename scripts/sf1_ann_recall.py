"""sf1 retrieval-QUALITY spot-check for the PQ/IVFADC serving stack
(SCALING.md's timing protocol measures wall clock; this measures what
the timed queries actually retrieve at 10x corpus under LEARNED
artifacts — the combination the catalog rows can't oracle-check).

Protocol: ~50 corpus vectors become queries; ground truth is the exact
L2 top-1 neighbor (self excluded), computed driver-side in numpy —
fine for a measurement harness, never a production path.  Served
answers come from the real distributed operators under codebooks
learned by per-subspace k-means (`train_pq_codebooks`) and IVF
centroids learned by k-means on RAW vectors — raw, not normalized,
because ADC ranks raw L2 distance and the probe order must agree with
the ranking metric (`ivf_assign`'s spherical variant serves the
cosine-ranked `ivf_topk` path, which has its own recall pin in
tests/test_scale_utils.py).

Reported per stack: recall@1 and recall@10 (is the true NN in the
top-10 shortlist?) — the shortlist number is what a re-ranking
deployment (ADC shortlist -> exact re-rank, the standard IVFADC
serving recipe) actually relies on.

Usage: python scripts/sf1_ann_recall.py [sf_dir]   (default .scaling/sf1)
Prints one JSON line; exits non-zero if shortlist recall@10 < 0.9 for
either stack at the serving default n_probe=4.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SUB, N_CODES, DIM = 8, 16, 64
K_CELLS = 16


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scaling", "sf1")
    import numpy as np
    from pyspark.sql import functions as F

    from metalpipe_spark.session import get_spark

    spark = get_spark(app_name="sf1-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    from metalpipe_spark.operators.pq import (
        ivfadc_topk,
        pq_adc_topk,
        pq_encode_gemm,
        train_pq_codebooks,
    )
    from metalpipe_spark.operators.similarity import ivf_assign_literal
    from metalpipe_spark.sources.readers import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings", rebalance=True)
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()
    stride = max(1, n // 50)
    qs = emb.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # Ground truth: exact L2 top-1, self excluded (driver-side numpy —
    # the measurement oracle, not a serving path).
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    qmask = ids % stride == 0
    qids = ids[qmask]
    Q = V[qmask]
    d2 = ((Q * Q).sum(1)[:, None] - 2.0 * (Q @ V.T)) + (V * V).sum(1)[None, :]
    d2[np.arange(len(qids)), np.searchsorted(ids, qids)] = np.inf  # self
    truth = {int(q): int(ids[j]) for q, j in zip(qids, d2.argmin(1))}

    # Learned artifacts: per-subspace k-means codebooks on a corpus
    # sample; IVF centroids by k-means on raw vectors (fit on sample,
    # serve as literals — the 100 TB recipe).
    t0 = time.perf_counter()
    books = train_pq_codebooks(
        emb, N_SUB, N_CODES, DIM, sample_fraction=0.25, seed=42
    )
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    km = KMeans(k=K_CELLS, seed=42, maxIter=10, featuresCol="__v").fit(
        emb.sample(fraction=0.25, seed=42).select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias("__v")
        )
    )
    cents = [[float(x) for x in c] for c in km.clusterCenters()]
    train_s = time.perf_counter() - t0

    enc = pq_encode_gemm(
        ivf_assign_literal(emb, cents).select("cell", "vec_id", "embedding"),
        books,
    ).persist()
    enc.count()

    def recall(topk_df, at: int) -> float:
        # keep the best `at` non-self ids per query, in rank order
        got: dict[int, list[int]] = {}
        for r in topk_df.orderBy("query_id", "rnk").collect():
            q, d = int(r["query_id"]), int(r["vec_id"])
            if d != q and len(got.setdefault(q, [])) < at:
                got[q].append(d)
        return sum(
            1 for q, t in truth.items() if t in got.get(q, [])[:at]
        ) / len(truth)

    out: dict = {
        "sf_dir": sf_dir,
        "n_vectors": int(n),
        "n_queries": len(truth),
        "geometry": {"n_sub": N_SUB, "n_codes": N_CODES, "k_cells": K_CELLS},
        "train_sec": round(train_s, 2),
    }
    from metalpipe_spark.operators.pq import adc_rerank

    t0 = time.perf_counter()
    pq_full = pq_adc_topk(enc, qs, books, k=11)
    out["pq_adc_full"] = {
        "recall@1": recall(pq_full, 1),
        "recall@10": recall(pq_full, 10),
        "wall_sec": round(time.perf_counter() - t0, 2),
    }
    for n_probe in (1, 2, 4):
        t0 = time.perf_counter()
        iv = ivfadc_topk(enc, qs, cents, books, k=11, n_probe=n_probe)
        out[f"ivfadc_nprobe{n_probe}"] = {
            "recall@1": recall(iv, 1),
            "recall@10": recall(iv, 10),
            "wall_sec": round(time.perf_counter() - t0, 2),
        }
    # Two-stage serving: ADC shortlist (R=50) -> exact re-rank — the
    # configuration q_ann_pq_rerank ships; recall@1 is the gate.
    t0 = time.perf_counter()
    rr = adc_rerank(
        pq_adc_topk(enc, qs, books, k=50), emb, qs, k=11
    )
    out["pq_rerank50"] = {
        "recall@1": recall(rr, 1),
        "wall_sec": round(time.perf_counter() - t0, 2),
    }
    t0 = time.perf_counter()
    rr_ivf = adc_rerank(
        ivfadc_topk(enc, qs, cents, books, k=50, n_probe=4), emb, qs, k=11
    )
    out["ivfadc_nprobe4_rerank50"] = {
        "recall@1": recall(rr_ivf, 1),
        "wall_sec": round(time.perf_counter() - t0, 2),
    }
    print(json.dumps(out))
    ok = (
        out["pq_adc_full"]["recall@10"] >= 0.9
        and out["ivfadc_nprobe4"]["recall@10"] >= 0.9
        and out["pq_rerank50"]["recall@1"] >= 0.9
        and out["ivfadc_nprobe4_rerank50"]["recall@1"] >= 0.9
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
