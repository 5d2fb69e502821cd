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
"""

from __future__ import annotations

import json
import sys


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
    nsamples = new.get("samples", {})
    hard = []
    for q in shared:
        ratio = nq[q] / oq[q] if oq[q] else float("inf")
        if ratio <= thr:
            continue
        warm = min(nsamples.get(q, [nq[q]])[1:] or [nq[q]])
        verdict = "ambient/first-run" if warm <= thr * oq[q] else "REAL"
        if verdict == "REAL":
            hard.append(q)
        print(
            f"  {q}: {oq[q]:.2f}s -> {nq[q]:.2f}s ({ratio:.2f}x)"
            f" warm-min {warm:.2f}s [{verdict}]"
        )
    if not hard:
        print("no regressions beyond warm-min threshold")
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
