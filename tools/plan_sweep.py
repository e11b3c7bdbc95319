"""Rank every bench-headline query by static-plan bulk (r13 sweep).

Usage: python tools/plan_sweep.py [--sf DIR] [name ...]

For each query, render `.explain("formatted")` (static plan — no
execution) and count parquet scans, Exchanges, and plan bytes. Repeated
`Scan parquet` nodes over the same table inside ONE query are the
re-derived-subtree smell the r13 persist wins came from
(guide §2.4 / §3.3): the formatted text expands shared lineage per
consumer, so a high scan count flags subtrees built more than once at
runtime unless an InMemoryRelation/checkpoint truncates them.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from sarpro_spark.queries import spark_queries
from sarpro_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    args = ap.parse_args()

    spark = build_session("plan_sweep")
    qs = spark_queries()
    names = args.names or [n for n in HEADLINE if n in qs]
    rows = []
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - sweep must survive one bad query
            print(f"!! {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        scans = len(re.findall(r"Scan parquet", plan))
        inmem = len(re.findall(r"InMemoryRelation|InMemoryTableScan", plan))
        exch = len(re.findall(r"\bExchange\b|BroadcastExchange", plan))
        rows.append((name, scans, inmem, exch, len(plan)))
        spark.catalog.clearCache()
    rows.sort(key=lambda r: (-r[1], -r[3]))
    print(f"{'query':42s} {'scans':>5s} {'inmem':>5s} {'exch':>5s} {'bytes':>8s}")
    for name, scans, inmem, exch, size in rows:
        print(f"{name:42s} {scans:5d} {inmem:5d} {exch:5d} {size:8d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
