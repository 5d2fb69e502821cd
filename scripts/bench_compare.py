"""Compare two bench artifacts on their SHARED query subset — the
cross-round regression math (BENCH_NOTES.md's subset protocol) as a
tool instead of by-hand arithmetic, using the environment fingerprint
and raw samples the r10 bench records.

Usage: python scripts/bench_compare.py OLD.json NEW.json [threshold]

Prints the shared-subset totals and every query whose NEW median
exceeds threshold x OLD (default 1.15).  When both artifacts carry raw
samples, a flagged row also shows NEW's warm minimum vs OLD's median —
if the warm min is back under threshold, the regression is first-run /
ambient noise, not plan cost.  Exits non-zero if any row stays flagged
on warm-min too (the "needs a code-level explanation" set).

Calibration normalization (r16, closing the r15 q_audio_neardup
misfire): when BOTH artifacts carry the fixed-work ``calib`` stamp,
every cross-round ratio is divided by the host-drift ratio of the
matching calibration component before any [REAL] stamp — ``numpy_sec``
for numpy-kernel-heavy rows (the prefix list below), ``jvm_hash_sec``
for everything else.  The r15 close itself measured +19% same-day
numpy drift on identical code; unnormalized ratios stamped an
untouched row [REAL] at 1.56x.  Raw ratios still print alongside.
"""

from __future__ import annotations

import json
import sys

# Rows whose hot loop is a Python/Arrow numpy kernel (fingerprints,
# GEMM folds, codecs) rather than JVM codegen — their cross-round
# ratios track the numpy calib component, not the JVM one.
NUMPY_ROW_PREFIXES = (
    "q_audio_",
    "q_image_",
    "q_incremental_image",
    "q_multimodal",
    "q_frame_",
    "q_video_",
    "q_ann_",
    "q_embed_",
    "q_ivf_",
    "q_pq_",
    "q_stream_embed",
    "q_semdedup",
    "q_incremental_semdedup",
)


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    # Driver artifacts are sometimes head-truncated; take the last
    # parseable line.
    for line in reversed(txt.splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no parseable JSON line")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    if not shared:
        raise SystemExit("no shared queries")
    ot = sum(oq[q] for q in shared)
    nt = sum(nq[q] for q in shared)
    print(
        f"shared subset: {len(shared)} queries | old {ot:.1f}s -> new {nt:.1f}s"
        f" = {nt / ot:.2f}x"
    )
    for which, art in (("old", old), ("new", new)):
        env = art.get("env", {})
        if env:
            b = env.get("before", {})
            a = env.get("after", {})
            print(
                f"  {which} env: loadavg {b.get('loadavg', '?')} ->"
                f" {a.get('loadavg', '?')}"
            )
    ocal = old.get("calib") or {}
    ncal = new.get("calib") or {}

    def cal_ratio(key: str) -> float:
        o, n = ocal.get(key), ncal.get(key)
        return (n / o) if o and n else 1.0

    jvm_r, np_r = cal_ratio("jvm_hash_sec"), cal_ratio("numpy_sec")
    if ocal and ncal:
        print(
            f"  calib drift old->new: jvm {jvm_r:.3f}x,"
            f" numpy {np_r:.3f}x (ratios below are divided by the"
            " matching component before any [REAL] stamp)"
        )
    nsamples = new.get("samples", {})
    hard = []
    for q in shared:
        ratio = nq[q] / oq[q] if oq[q] else float("inf")
        norm = np_r if q.startswith(NUMPY_ROW_PREFIXES) else jvm_r
        adj = ratio / norm
        if adj <= thr:
            continue
        warm = min(nsamples.get(q, [nq[q]])[1:] or [nq[q]])
        warm_adj = (warm / oq[q]) / norm if oq[q] else float("inf")
        if warm_adj <= thr:
            verdict = "ambient/first-run"
        else:
            verdict = "REAL"
            hard.append(q)
        print(
            f"  {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s ({ratio:.2f}x raw,"
            f" {adj:.2f}x calib-adj)"
            f" warm-min {warm:.2f}s ({warm_adj:.2f}x adj) [{verdict}]"
        )
    if not hard:
        print("no regressions beyond calib-adjusted warm-min threshold")
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
