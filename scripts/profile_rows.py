"""Split a catalog row's bench time into build vs drain.

Usage: python scripts/profile_rows.py [--runs N] [--sf sf_dir] q_a q_b ...
       python scripts/profile_rows.py --top 25        # slowest by BENCH file

For each row: t_build = registry[name].build(spark, sf_dir) wall
(driver-side plan construction, any operator-internal collects, and for
streaming rows the availableNow stream run), t_drain = the bench's
checksum-drain aggregate wall.  The bench medians time build+drain
together; knowing which side dominates decides whether to attack the
plan (Exchange count, join strategy) or the harness-visible driver work
(guide §1: measure first, then pick the lever).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    runs = 3
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = argv
    from pyspark.sql import functions as F

    from metalpipe_spark.catalog import load_all
    from metalpipe_spark.catalog.dedup import clear_shared_stages
    from metalpipe_spark.session import get_spark

    from bench import PAYS_SHARED_STAGE

    spark = get_spark(app_name="profile-rows")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    # Same warm-up spirit as bench.py, cheap version.
    spark.range(100000).select(F.xxhash64("id").alias("h")).agg(
        F.bit_xor("h")
    ).collect()
    print(f"{'row':38s} {'build':>8s} {'drain':>8s} {'total':>8s}")
    for name in names:
        if name not in registry:
            print(f"{name}: UNKNOWN")
            continue
        builds, drains = [], []
        for _ in range(runs):
            spark.catalog.clearCache()
            # Mirror bench.py's accounting: only the designated payer
            # re-pays its family's shared stage each run.
            if name in PAYS_SHARED_STAGE:
                clear_shared_stages(PAYS_SHARED_STAGE[name])
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = registry[name].build(spark, sf_dir)
            t1 = time.perf_counter()
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(*df.columns)).alias("checksum"),
            ).collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            drains.append(t2 - t1)
        b = statistics.median(builds)
        d = statistics.median(drains)
        print(f"{name:38s} {b:8.3f} {d:8.3f} {b + d:8.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
