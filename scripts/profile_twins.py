#!/usr/bin/env python3
"""A/B profile of the rate-limited streaming twins (round-12 VERDICT
item 2: attribute the r9->r11 regression pinned by idle-host records).

Runs each named twin entry ``reps`` times per trigger cadence listed
in ``SEH_PROF_TICKS`` (default "5,50" ms), printing per-run wall time
plus the engine's own per-batch durationMs via SEH_STREAM_DEBUG.

Usage: python3 scripts/profile_twins.py [sf_dir] [entry ...]
Env: SEH_PROF_TICKS=5,50  SEH_PROF_REPS=3
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep + os.environ.get("PYTHONPATH", "")
)
os.environ.setdefault("SEH_STREAM_DEBUG", "1")


def main() -> int:
    args = sys.argv[1:]
    # Only argv[1] may be the sf_dir, and only if it LOOKS like a path
    # — a mistyped path must error out, never be silently reinterpreted
    # as an entry name (r12 ADVICE)
    sf_dir = "/root/testdata/sf0.1"
    if args and (os.sep in args[0] or args[0].startswith(".")):
        if not os.path.isdir(args[0]):
            raise SystemExit(f"sf_dir does not exist: {args[0]}")
        sf_dir = args.pop(0)
    names = args or ["stream_heavy_hitters", "stream_running_counters"]
    ticks = [int(t) for t in os.environ.get("SEH_PROF_TICKS", "5,50").split(",")]
    reps = int(os.environ.get("SEH_PROF_REPS", "3"))

    from pyspark.sql import SparkSession

    from spark_eventhubs_spark.plans.hubview import (
        clear_cached_plans,
        configure_session,
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown entry name(s): {unknown}")

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure_session(spark)

    for name in names:
        fn = qs[name]
        # one warm run (ingest artifact + JVM warmup), untimed cohort
        fn(spark, sf_dir).collect()
        for tick in ticks:
            os.environ["SEH_STREAM_TICK_MS"] = str(tick)
            walls = []
            for _ in range(reps):
                # same per-rep reset the bench uses: drop the entry's
                # memoized plan (forces a fresh drain) but keep the
                # session-scoped hub ingest artifact
                clear_cached_plans(spark, "query")
                t0 = time.time()
                n = len(fn(spark, sf_dir).collect())
                walls.append(time.time() - t0)
                print(f"{name} tick={tick}ms wall={walls[-1]:.2f}s rows={n}",
                      flush=True)
            print(f"== {name} tick={tick}ms median={statistics.median(walls):.2f}s "
                  f"min={min(walls):.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
