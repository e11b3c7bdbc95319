"""Solo-run profiler for one or more registered queries.

Usage: python tools/probe.py [--sf DIR] [--runs N] query [query ...]

For each query: construct + count() (the bench's timed action), and report
wall seconds, process-tree CPU seconds (bench.tree_cpu_sec — steal-
resistant), and the Spark job/stage/task counts the run scheduled (via
StatusTracker). Job count approximates the scheduling-floor exposure that
dominates sub-second lines at sf0.1; task count exposes tiny-partition
overhead (guide §1.1: decide whether time goes to compute or scheduling
before optimizing either).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import tree_cpu_sec
from sarpro_spark import frames
from sarpro_spark.queries import spark_queries
from sarpro_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = build_session("probe")
    sc = spark.sparkContext
    qs = spark_queries()
    # warm JVM + footer cache like bench.py
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    for name in args.names:
        for r in range(args.runs):
            spark.catalog.clearCache()
            frames._BAND_FRAME_CACHE.clear()
            frames.band_frame(spark, args.sf).count()
            tracker = sc.statusTracker()
            before_jobs = set(tracker.getJobIdsForGroup(None))
            c0 = tree_cpu_sec()
            t0 = time.time()
            df = qs[name](spark, args.sf)
            n = df.count()
            wall = time.time() - t0
            cpu = tree_cpu_sec() - c0
            jobs = [j for j in tracker.getJobIdsForGroup(None) if j not in before_jobs]
            stages, tasks = 0, 0
            hist: dict[int, int] = {}
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        stages += 1
                        tasks += si.numTasks
                        hist[si.numTasks] = hist.get(si.numTasks, 0) + 1
            dist = " ".join(f"{k}t*{v}" for k, v in sorted(hist.items()))
            print(
                f"{name} run{r}: wall {wall:.2f}s cpu {cpu:.1f}s "
                f"jobs {len(jobs)} stages {stages} tasks {tasks} rows {n} [{dist}]",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
