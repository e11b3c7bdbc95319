"""Thread-level CPU attribution for one registered query.

Runs the query like bench.py (construct + count) and reports, per THREAD
NAME (/proc/<pid>/task/<tid>/comm, summed over the whole process tree),
the CPU seconds consumed during the timed region. Distinguishes C2/C1 JIT
compiler threads, GC threads, executor task workers, the main driver
thread, and Python workers — guide §1.1: decide where the time goes
before optimizing anything.

Usage: python tools/cpu_attr.py [--sf DIR] [--runs N] query [query ...]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sarpro_spark import frames
from sarpro_spark.queries import spark_queries
from sarpro_spark.session import build_session


def tree_pids() -> list[int]:
    me = os.getpid()
    ppid_of = {}
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            raw = open(stat).read()
        except OSError:
            continue
        pid_s, rest = raw.split(" ", 1)
        fields = rest.rsplit(")", 1)[1].split()
        ppid_of[int(pid_s)] = int(fields[1])
    out = []
    for pid in ppid_of:
        p, hops = pid, 0
        while p > 1 and hops < 64:
            if p == me:
                out.append(pid)
                break
            p = ppid_of.get(p, 0)
            hops += 1
    return out


def thread_cpu_by_name() -> dict[str, float]:
    tick = os.sysconf("SC_CLK_TCK")
    acc: dict[str, float] = collections.defaultdict(float)
    for pid in tree_pids():
        for tdir in glob.glob(f"/proc/{pid}/task/[0-9]*"):
            try:
                raw = open(f"{tdir}/stat").read()
                comm = raw[raw.index("(") + 1 : raw.rindex(")")]
                fields = raw.rsplit(")", 1)[1].split()
            except (OSError, ValueError):
                continue
            cpu = (int(fields[11]) + int(fields[12])) / tick
            # collapse numbered families: "C2 CompilerThre", "GC Thread#3",
            # "Executor task l..." etc.
            name = "".join(c for c in comm if not c.isdigit()).strip("#- ")
            acc[name] += cpu
    return dict(acc)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = build_session("cpu_attr")
    qs = spark_queries()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    for name in args.names:
        for r in range(args.runs):
            spark.catalog.clearCache()
            frames._BAND_FRAME_CACHE.clear()
            frames.band_frame(spark, args.sf).count()
            before = thread_cpu_by_name()
            t0 = time.time()
            df = qs[name](spark, args.sf)
            n = df.count()
            wall = time.time() - t0
            after = thread_cpu_by_name()
            delta = [
                (after.get(k, 0.0) - before.get(k, 0.0), k)
                for k in set(after) | set(before)
            ]
            delta = [(v, k) for v, k in delta if v >= 0.05]
            delta.sort(reverse=True)
            tot = sum(v for v, _ in delta)
            print(f"\n== {name} run{r}: wall {wall:.2f}s, attributed cpu {tot:.1f}s ({n} rows)")
            for v, k in delta[:18]:
                print(f"  {v:7.2f}s  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
