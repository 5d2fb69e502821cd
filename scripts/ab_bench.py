"""Interleaved same-host A/B subset bench — the r16 arbitration recipe,
scripted (BENCH_NOTES "checkout side-by-side").

Usage:
  python scripts/ab_bench.py --rows q_a,q_b --a DIR_A --b DIR_B \
      [--reps 3] [--sf /root/testdata/sf0.1] [--cpus 32] [--json PATH]

Runs ``bench.py`` with SPARK_GRAFT_BENCH_ONLY=rows alternately from
DIR_A and DIR_B (A,B,A,B,...) so both code states sample the SAME host
window; each leg is stamped with the /proc/stat steal delta so a
neighbor-VM burst (this microVM's dominant noise source, 3-17x row
inflation with clean calibs) is visible per leg instead of silently
poisoning one side.  Per-row output: every leg's median, the
median-of-legs per side, and the B/A ratio.

This measures CODE deltas only — both dirs must point at the same
testdata; nothing here feeds the committed BENCH artifacts.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def steal_snap() -> tuple[float, float]:
    with open("/proc/stat") as f:
        p = f.readline().split()
    # user nice system idle iowait irq softirq steal
    return int(p[8]) / 100.0, (int(p[1]) + int(p[3]) + int(p[8])) / 100.0


def run_leg(d: str, rows: str, sf: str, cpus: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ONLY=rows,
        SPARK_GRAFT_SF_DIR=sf,
        SPARK_GRAFT_CPUS=cpus,
    )
    s0, t0 = steal_snap()
    w0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=d,
        env=env,
        capture_output=True,
        text=True,
    )
    wall = time.perf_counter() - w0
    s1, t1 = steal_snap()
    qs = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if obj.get("bench_line") == "full":
                qs = obj.get("queries", {})
    return {
        "dir": d,
        "queries": qs,
        "wall": round(wall, 1),
        "steal_sec": round(s1 - s0, 1),
        "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1e-9), 1),
        "rc": out.returncode,
        "stderr_tail": out.stderr[-400:] if out.returncode else "",
    }


def main() -> int:
    argv = sys.argv[1:]

    def opt(name: str, default: str | None = None) -> str | None:
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    rows = opt("--rows")
    a = opt("--a", "/root/repo")
    b = opt("--b")
    reps = int(opt("--reps", "3"))
    sf = opt("--sf", "/root/testdata/sf0.1")
    cpus = opt("--cpus", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    json_path = opt("--json")
    if not rows or not b:
        print(__doc__)
        return 2
    legs = []
    for r in range(reps):
        for side, d in (("A", a), ("B", b)):
            leg = run_leg(d, rows, sf, cpus)
            leg["side"], leg["rep"] = side, r
            legs.append(leg)
            print(
                f"rep{r} {side} wall={leg['wall']}s steal={leg['steal_pct']}% "
                + " ".join(
                    f"{k}={v:.2f}" for k, v in sorted(leg["queries"].items())
                ),
                flush=True,
            )
            if leg["rc"]:
                print(f"  LEG FAILED rc={leg['rc']}: {leg['stderr_tail']}")
    names = sorted({k for l in legs for k in l["queries"]})
    summary = {}
    print(f"\n{'row':34s} {'A_med':>7s} {'B_med':>7s} {'B/A':>6s}  per-leg A | B")
    for n in names:
        av = [l["queries"][n] for l in legs if l["side"] == "A" and n in l["queries"]]
        bv = [l["queries"][n] for l in legs if l["side"] == "B" and n in l["queries"]]
        am = statistics.median(av) if av else float("nan")
        bm = statistics.median(bv) if bv else float("nan")
        summary[n] = {"A": round(am, 3), "B": round(bm, 3),
                      "ratio": round(bm / am, 3) if av and bv and am else None,
                      "A_legs": av, "B_legs": bv}
        print(
            f"{n:34s} {am:7.2f} {bm:7.2f} {bm / am if am else 0:6.2f}  "
            f"{'/'.join(f'{x:.2f}' for x in av)} | "
            f"{'/'.join(f'{x:.2f}' for x in bv)}"
        )
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"rows": rows, "a": a, "b": b, "legs": legs,
                       "summary": summary}, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
