"""Build an sf1-scale synthetic corpus for SCALING.md's sf0.1→sf1
spot-check (the driver provides sf{0.001,0.01,0.1} only).

Each sf0.1 document is replicated 10× with a seeded word-level
perturbation (~20% of tokens swapped for random vocab words), so the
10× corpus keeps the word-frequency and shingle-overlap SHAPE of the
original instead of exploding near-dup density with exact copies —
exact copies would make every doc a 10-clone cluster and turn the
connected-components measurement into a different workload.
Embeddings are replicated with seeded Gaussian jitter.

Output: .scaling/sf1/{documents,embeddings}.parquet inside the repo
(git-ignored; measurement input only, never an oracle input).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling", "sf1")
REPLICAS = 10


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260813)

    docs = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    vocab = np.array(sorted({t for s in docs["text"] for t in s.split()}))
    n = len(docs)
    out = []
    for r in range(REPLICAS):
        rep = docs.copy()
        rep["doc_id"] = docs["doc_id"] + r * n
        if r > 0:
            texts = []
            for s in docs["text"]:
                # dtype=object: a fixed-width '<U{k}' token array would
                # silently TRUNCATE replacement vocab words longer than
                # the doc's longest token ('customer' -> 'cu'), seeding
                # the corpus with tokens that exist nowhere in the vocab
                # and distorting the word-frequency shape this script
                # promises to preserve.
                toks = np.array(s.split(), dtype=object)
                mask = rng.random(len(toks)) < 0.2
                toks[mask] = vocab[rng.integers(0, len(vocab), mask.sum())]
                texts.append(" ".join(toks))
            rep["text"] = texts
            rep["n_chars"] = rep["text"].str.len()
        out.append(rep)
    big = pd.concat(out, ignore_index=True)
    big.to_parquet(os.path.join(OUT, "documents.parquet"), index=False)

    emb = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"))
    m = len(emb)
    vecs = np.stack(emb["embedding"].to_numpy())
    eout = []
    for r in range(REPLICAS):
        rep = emb.copy()
        rep["vec_id"] = emb["vec_id"] + r * m
        if r > 0:
            jit = vecs + rng.normal(0, 0.05, vecs.shape).astype(np.float32)
            rep["embedding"] = list(jit.astype(np.float32))
        eout.append(rep)
    pd.concat(eout, ignore_index=True).to_parquet(
        os.path.join(OUT, "embeddings.parquet"), index=False
    )

    # Events scale as "10x the traffic": same 30-day window (so window
    # COUNT stays fixed and per-window density grows with data — the
    # shape a real scale-up has), DISJOINT user ids per replica (so
    # per-user stream-join/session density stays constant and join
    # output grows linearly, not quadratically), fresh event ids, ts
    # jittered by a few seconds so replicas are not tick-identical.
    ev = pd.read_parquet(os.path.join(SRC, "events.parquet"))
    k = len(ev)
    users = int(ev["user_id"].max()) + 1
    evout = []
    for r in range(REPLICAS):
        rep = ev.copy()
        rep["event_id"] = ev["event_id"] + r * k
        if r > 0:
            rep["user_id"] = ev["user_id"] + r * users
            rep["ts"] = ev["ts"] + pd.to_timedelta(
                rng.integers(-5_000_000, 5_000_000, k), unit="us"
            )
        evout.append(rep)
    pd.concat(evout, ignore_index=True).to_parquet(
        os.path.join(OUT, "events.parquet"), index=False
    )
    print(
        f"wrote {len(big)} docs, {m * REPLICAS} embeddings, "
        f"{k * REPLICAS} events -> {OUT}"
    )


if __name__ == "__main__":
    main()
