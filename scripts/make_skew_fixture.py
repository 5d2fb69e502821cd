"""Build the SKEWED sf0.1 corpus for SCALING.md's skew table (VERDICT
r10 task 5).  The driver's sf fixtures scale volume with near-uniform
keys; a real web corpus does not — one hot domain can be 10-40% of all
rows and one boilerplate paragraph can appear in nearly half the
documents.  This fixture injects exactly those two skews into the sf0.1
documents table, SAME schema and row count, so every catalog query runs
unmodified with sf_dir pointed here and uniform-vs-skew timing ratios
isolate key distribution from data volume:

- HOST SKEW: ``source`` is reassigned Zipf-style — the hottest source
  takes ~40% of rows, the next ~20%, then a long tail over the original
  source values.  q_domain_stats / q_url_dedup / q_host_filter key
  their shuffles on host or canonical URL derived from ``source``.

- BOILERPLATE SKEW: a fixed 32-token banner (one full _PCHUNK window,
  so it lands as ONE chunk fingerprint) is prepended to ~40% of docs,
  and a second banner to another ~10% — one chunk md5 then dominates
  q_paragraph_dedup's groupBy-min, q_boilerplate_removal's
  count(DISTINCT doc) and its fingerprint join-back.

Deterministic (seeded); output .scaling/skew_sf0.1/documents.parquet
(git-ignored; measurement input only, never an oracle input).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaling",
    "skew_sf0.1",
)

BANNER_A = " ".join(f"bannera{i}" for i in range(32))
BANNER_B = " ".join(f"bannerb{i}" for i in range(32))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260815)

    docs = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    n = len(docs)

    # Zipf-ish host mass: 40% / 20% / 8% to three hot sources, the
    # remaining 32% spread over the tail — which requires a tail to
    # exist: with <= 3 distinct sources the hot fractions would be
    # silently renormalized (40% -> 59%) and the SCALING.md protocol
    # would measure a different fixture than it documents.
    sources = sorted(docs["source"].unique())
    if len(sources) <= 3:
        raise SystemExit(
            f"skew fixture needs > 3 distinct sources, got {len(sources)}"
        )
    probs = np.full(len(sources), 0.32 / (len(sources) - 3))
    probs[:3] = [0.40, 0.20, 0.08]
    probs /= probs.sum()  # exact 1.0 modulo float error
    docs = docs.copy()
    docs["source"] = rng.choice(sources, size=n, p=probs)

    # Boilerplate: banner A on 40% of docs, banner B on a further 10%.
    u = rng.random(n)
    text = docs["text"].to_numpy(dtype=object)
    for i in range(n):
        if u[i] < 0.40:
            text[i] = f"{BANNER_A} {text[i]}"
        elif u[i] < 0.50:
            text[i] = f"{BANNER_B} {text[i]}"
    docs["text"] = text
    docs["n_chars"] = docs["text"].str.len()

    docs.to_parquet(os.path.join(OUT, "documents.parquet"), index=False)
    top = docs["source"].value_counts(normalize=True).head(3)
    print(f"wrote {OUT}/documents.parquet: {n} rows")
    print("hot sources:", {k: round(v, 3) for k, v in top.items()})
    print(
        "banner A docs:",
        int((u < 0.40).sum()),
        "banner B docs:",
        int(((u >= 0.40) & (u < 0.50)).sum()),
    )


if __name__ == "__main__":
    main()
